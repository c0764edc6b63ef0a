package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert with last-write-wins semantics (SURVEY §2.1 u1) —
  * the reference's `collection.upsert` re-keyed by id
  * (/root/reference/src/db.py:72-80): a newer batch replaces older rows
  * with the same key.
  *
  * One shuffle on the key; ties inside a version are broken
  * deterministically by preferring the later batch row only via the
  * version column, so inputs must carry distinct versions per batch —
  * the standard merge-on-read compaction shape at scale.
  */
object Upsert {

  def lastWriteWins(batches: DataFrame, keyCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(versionCol).desc)
    batches.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
