package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group percentiles over an INTEGER value column without
  * ever sorting rows: the distribution collapses to a VALUE HISTOGRAM
  * (group, value, count) — cardinality = distinct values, not rows —
  * and percentile ranks are read off the histogram's running count.
  * The per-group window runs over the collapsed histogram (thousands
  * of rows per group at any corpus size), so this stays exact where a
  * sketch (m4) approximates and global where a collect_list (m1)
  * cannot go. Interpolation is numpy-style linear in m1/m11's exact
  * double op order: lo + (hi − lo) · frac, integer subtraction first.
  *
  * Returns one row per group: groupCol, n, p50, p95, p99 (6 dp).
  */
object Pcts {
  val Quantiles: Seq[(Double, String)] =
    Seq(0.50 -> "p50", 0.95 -> "p95", 0.99 -> "p99")

  def groupedExact(df: DataFrame, groupCol: String, valueCol: String)
  : DataFrame = {
    val g = col(groupCol)
    val hist = df.select(g, col(valueCol).cast("long").as("__v"))
      .groupBy(groupCol, "__v").agg(count(lit(1)).as("__cnt"))
    val wCum = Window.partitionBy(groupCol).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("__cum", sum("__cnt").over(wCum))
      .withColumn("__lo_cum", col("__cum") - col("__cnt"))
      .localCheckpoint() // joined once per rank probe (lo and hi)
    val ranks = hist.groupBy(groupCol).agg(sum("__cnt").as("__n"))
      .select(g, col("__n"), explode(array(Quantiles.map { case (q, nm) =>
        struct(lit(q).as("q"), lit(nm).as("pct")) }: _*)).as("__qq"))
      .select(g, col("__n"), col("__qq.q").as("__q"),
        col("__qq.pct").as("__pct"))
      .withColumn("__pos", (col("__n") - 1).cast("double") * col("__q"))
      .withColumn("__lo", floor(col("__pos")))
      .withColumn("__frac", col("__pos") - col("__lo").cast("double"))
      .withColumn("__r_lo", col("__lo") + 1)
      .withColumn("__r_hi",
        col("__lo") + when(col("__frac") === 0.0, 1).otherwise(2))
    val loV = ranks.join(cum, Seq(groupCol))
      .filter(col("__r_lo") > col("__lo_cum") && col("__r_lo") <= col("__cum"))
      .select(g, col("__pct"), col("__n"), col("__frac"),
        col("__v").as("__v_lo"))
    val hiV = ranks.join(cum, Seq(groupCol))
      .filter(col("__r_hi") > col("__lo_cum") && col("__r_hi") <= col("__cum"))
      .select(g, col("__pct"), col("__v").as("__v_hi"))
    val interp = loV.join(hiV, Seq(groupCol, "__pct"))
      .withColumn("__iv", round(col("__v_lo").cast("double")
        + (col("__v_hi") - col("__v_lo")).cast("double") * col("__frac"), 6))
    interp.groupBy(groupCol).agg(
      max("__n").as("n"),
      max(when(col("__pct") === "p50", col("__iv"))).as("p50"),
      max(when(col("__pct") === "p95", col("__iv"))).as("p95"),
      max(when(col("__pct") === "p99", col("__iv"))).as("p99"))
  }
}
