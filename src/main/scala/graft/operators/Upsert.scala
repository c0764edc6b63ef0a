package graft.operators

import org.apache.spark.sql.DataFrame
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
    // max_by over the version (distinct per key — the declared input
    // contract above) replaces the rank-1 window: the shuffle on the
    // key stays, but the per-partition sort goes away and the
    // aggregation combines map-side — on the serving path this runs
    // over the whole assignment table at every index read. The winning
    // row's payload travels as ONE struct so its columns stay mutually
    // consistent (the assignCells min_by pattern).
    val others = batches.columns.filter(_ != keyCol).toSeq
    batches
      .groupBy(col(keyCol))
      .agg(max_by(struct(others.map(col): _*), col(versionCol)).as("__w"))
      .select(batches.columns.toSeq.map(c =>
        if (c == keyCol) col(c) else col(s"__w.$c").as(c)): _*)
  }

  /** Change-data-capture merge (cdc1) — apply one I/U/D change batch
    * to a base table, the MERGE INTO every lakehouse table format
    * (Delta/Iceberg/Hudi) implements:
    *   D deletes the key, U replaces the payload, I adds a new key
    *   (column `op` in the change batch; one change row per key).
    * One outer join on the key decides every row's fate — base-only
    * rows survive unchanged, matched rows follow their op, change-only
    * rows must be inserts. At scale this is one shuffle on the key
    * (the change batch is typically tiny → AQE broadcasts it); the
    * merge-on-read variant would instead log the batch and fold it at
    * query time (u3's shape).
    *
    * Malformed changes fail loudly: an UPDATE/DELETE for a key absent
    * from base, or an INSERT for a key already present, raises at
    * execution (raise_error inside the surviving-value expression, so
    * pruning can't elide it) — silent misapplied CDC is how replicas
    * drift.
    */
  def cdcMerge(base: DataFrame, changes: DataFrame, keyCol: String,
               payloadCol: String): DataFrame = {
    val b = base.select(col(keyCol), col(payloadCol).as("__bp"))
    val c = changes.select(col(keyCol), col("op"), col(payloadCol).as("__cp"))
    b.join(c, Seq(keyCol), "full_outer")
      .withColumn("__v",
        when(col("op").isNull, col("__bp"))                   // untouched
          .when(col("op") === "D", lit(null))                 // delete
          .when(col("op") === "U" && col("__bp").isNotNull, col("__cp"))
          .when(col("op") === "I" && col("__bp").isNull, col("__cp"))
          .otherwise(raise_error(concat(lit("cdcMerge: op "), col("op"),
            lit(" invalid for key "), col(keyCol).cast("string"),
            lit(" (U/D need an existing row, I a new key)")))))
      .filter(!(col("op") <=> lit("D")))
      .select(col(keyCol), col("__v").as(payloadCol),
        coalesce(col("op"), lit("=")).as("op"))
  }
}
