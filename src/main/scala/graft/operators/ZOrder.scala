package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout + zone-map pruned scans
  * (SURVEY §2.7 zm1) — the multi-dimensional clustering every
  * lakehouse ships as `OPTIMIZE ... ZORDER BY (a, b)`: interleave the
  * bits of two clustering keys, range-block the curve, and keep
  * per-block min/max statistics (zone maps). A 2-D box predicate then
  * reads ONLY blocks whose stats intersect the box — a single-column
  * sort prunes one dimension and scans everything for the other,
  * while the Z-curve bounds locality in BOTH.
  *
  * Scale shape: the z-value is pure codegen'd bit arithmetic; blocks
  * are the top bits of z (deterministic — no range-sampling
  * nondeterminism); the block id doubles as the physical partition
  * column so pruning is real directory pruning (PartitionFilters in
  * the scan, the same mechanism a table format drives from its stats
  * file); the zone map is |blocks| rows on the driver — metadata-
  * sized, the analog of a Delta/Iceberg manifest.
  */
object ZOrder {

  val Bits = 16      // per-dimension bits (values must fit 16 bits)
  val BlockBits = 5  // 32 blocks = top 5 bits of the 32-bit z-value

  /** Morton interleave of two non-negative ints (< 2^16):
    * bit i of x → bit 2i, bit i of y → bit 2i+1. */
  def zValue(x: Column, y: Column): Column = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until Bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write df clustered by the Z-curve over (xCol, yCol): block = top
    * BlockBits of z, one file per block, block as the partition
    * column. Both keys are min/max-normalized onto the 16-bit domain
    * first — raw values occupy only their natural bit widths (user ids
    * ≪ 2^16, day offsets ≪ 2^8), and an unnormalized curve packs every
    * row into block 0 and gives the narrow dimension no interleave
    * weight. One metadata-sized range aggregation pays for it.
    * (Normalization arithmetic overflows past ~2^47 value ranges —
    * re-center such keys first.) */
  def writeLayout(df: DataFrame, xCol: String, yCol: String,
                  dir: String): Unit = {
    val r = df.agg(
      min(xCol).cast("long"), max(xCol).cast("long"),
      min(yCol).cast("long"), max(yCol).cast("long")).head()
    val (x0, x1, y0, y1) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    val top = (1L << Bits) - 1
    def norm(c: Column, lo: Long, hi: Long): Column =
      floor((c.cast("long") - lo) * lit(top.toDouble)
        / math.max(hi - lo, 1L)).cast("long")
    df.withColumn("__z", zValue(norm(col(xCol), x0, x1),
        norm(col(yCol), y0, y1)))
      .withColumn("block", shiftright(col("__z"), 2 * Bits - BlockBits))
      .drop("__z")
      .repartition(col("block"))
      .sortWithinPartitions(xCol, yCol)
      .write.mode("overwrite").partitionBy("block").parquet(dir)
  }

  /** The zone map: per-block min/max of both clustering keys. One
    * aggregation over the layout; |blocks| rows to the driver. */
  def blockStats(spark: SparkSession, dir: String, xCol: String,
                 yCol: String): Array[(Int, Long, Long, Long, Long)] =
    spark.read.parquet(dir)
      .groupBy("block")
      .agg(min(xCol).cast("long").as("x0"), max(xCol).cast("long").as("x1"),
        min(yCol).cast("long").as("y0"), max(yCol).cast("long").as("y1"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  /** Blocks whose zone intersects the box — the pruning decision. */
  def candidates(stats: Array[(Int, Long, Long, Long, Long)],
                 x0: Long, x1: Long, y0: Long, y1: Long): Seq[Int] =
    stats.filter { case (_, bx0, bx1, by0, by1) =>
      bx1 >= x0 && bx0 <= x1 && by1 >= y0 && by0 <= y1
    }.map(_._1).toSeq

  /** Zone-map-pruned box scan: only candidate block directories are
    * read (partition pruning on `block`), then the exact predicate
    * filters inside them. */
  def prunedScan(spark: SparkSession, dir: String,
                 stats: Array[(Int, Long, Long, Long, Long)],
                 xCol: String, yCol: String,
                 x0: Long, x1: Long, y0: Long, y1: Long): DataFrame = {
    val cand = candidates(stats, x0, x1, y0, y1)
    spark.read.parquet(dir)
      .filter(col("block").isin(cand: _*))
      .filter(col(xCol).between(x0, x1) && col(yCol).between(y0, y1))
  }
}
