package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.7): for every left row, the latest right row
  * with the same key and right_time <= left_time (backward, the
  * default) — or, with `forward = true`, the EARLIEST right row with
  * right_time >= left_time (a2: "next event after").
  *
  * Spark has no native ASOF JOIN; the naive formulation (theta-join on
  * `rts <= ts` + max + re-join) is quadratic per key. This is the
  * linear union-carry-forward shape: tag both sides, union, ONE shuffle
  * + sort on (key, time, side), then `last(right_payload, ignoreNulls)`
  * over the running window carries the newest right row forward into
  * each left row. Matches DuckDB's native ASOF JOIN (the oracle).
  * The forward direction is the SAME plan scanned in descending time:
  * the last right row seen is then the smallest rts >= ts.
  *
  * At equal timestamps the right row sorts first (side 0 < side 1) in
  * either direction, so <= / >= semantics hold. The right side must be
  * unique per (key, time) — pre-aggregate it — or the carried row is
  * order-dependent.
  */
object AsOfJoin {

  /** left: (key, ts, ...leftCols); right: (key, rts, payload...).
    * Result: left columns + right payload columns (null where no right
    * row precedes/follows; filter for inner semantics). */
  def leftAsOf(left: DataFrame, right: DataFrame,
               key: String, leftTime: String, rightTime: String,
               payloadCols: Seq[String], forward: Boolean = false): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        left.columns.filter(c => c != key).map(c => col(c)) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        left.columns.filter(c => c != key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(key)
      .orderBy(if (forward) col("__t").desc else col("__t").asc,
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(s"__carry_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(Seq(col(key)) ++
        left.columns.filter(c => c != key).map(col) ++
        payloadCols.map(c => col(s"__carry_$c").as(c)): _*)
  }
}
