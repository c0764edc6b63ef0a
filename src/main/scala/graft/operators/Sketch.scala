package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Count-Min-sketch heavy hitters (Cormode & Muthukrishnan).
  *
  * The 100 TB problem: "which tokens exceed x% of all occurrences"
  * naively needs a full `GROUP BY token` — a shuffle of every token
  * occurrence in the corpus, almost all of it long-tail singletons that
  * can never be heavy. The sketch fixes the shuffle volume:
  *
  *  1. ONE aggregation builds a d×w Count-Min sketch (d=4 independent
  *     polyhash rows × w=2048 buckets). Map-side combine reduces each
  *     partition to ≤ d·w cells, the merged sketch is d·w longs
  *     REGARDLESS of corpus size, and sketch cells are mergeable counts
  *     (the same shape works as a re-aggregatable daily rollup).
  *  2. The sketch is broadcast back as array literals; a codegen'd
  *     `least(element_at…)` per row gives est(t) ≥ true_count(t)
  *     (Count-Min never underestimates — collisions only inflate).
  *  3. The exact pass filters `est(t)·denom ≥ total` BEFORE its
  *     groupBy: the long tail dies map-side, and only plausible heavy
  *     hitters reach the exchange.
  *  4. An exact `HAVING` after the groupBy removes the sketch's false
  *     positives.
  *
  * No-underestimate (2) + exact rescore (4) ⇒ output is EXACTLY the
  * true heavy-hitter set — the oracle is the plain
  * `GROUP BY … HAVING count·denom ≥ total`. The threshold is integer
  * arithmetic (`n·denom ≥ total`) so both engines agree bit-for-bit.
  */
object Sketch {

  val Depth = 4
  val Width = 2048

  /** The d independent (base, mod) polyhash pairs (PolyHash scaladoc). */
  private val rowHashes: Seq[Column => Column] = Seq(
    PolyHash(_), PolyHash.second(_), PolyHash.third(_), PolyHash.fourth(_))

  private def bucket(r: Int, c: Column): Column =
    (rowHashes(r)(c) % Width).cast("int")

  /** Build the d×w sketch with one aggregation; returns d rows of w
    * counts. The collect is a fixed d·w = 8192 cells whatever the
    * corpus size — this is a sketch summary, not a data collect. */
  def buildSketch(tokens: DataFrame, tokenCol: String): Array[Array[Long]] = {
    val t = col(tokenCol)
    val cells = tokens
      .select(explode(array((0 until Depth).map(r =>
        struct(lit(r).as("r"), bucket(r, t).as("b"))): _*)).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val sk = Array.fill(Depth)(Array.fill(Width)(0L))
    cells.foreach(row => sk(row.getInt(0))(row.getInt(1)) = row.getLong(2))
    sk
  }

  /** est(t) = min over rows of the token's bucket count — codegen'd
    * literal-array lookups, no shuffle, no UDF. */
  def estimate(sk: Array[Array[Long]], c: Column): Column =
    least((0 until Depth).map(r =>
      element_at(typedLit(sk(r).toSeq), bucket(r, c) + 1)): _*)

  /** Exact heavy hitters: tokens with n·denom ≥ total occurrences
    * (e.g. denom=200 → ≥ 0.5% of the corpus). `tokens` is one row per
    * occurrence. */
  def heavyHitters(tokens: DataFrame, tokenCol: String, denom: Long): DataFrame = {
    val sk = buildSketch(tokens, tokenCol)
    // every occurrence lands in exactly one row-0 bucket → row sums = N
    val total = sk(0).sum
    tokens
      .filter(estimate(sk, col(tokenCol)) * denom >= total)
      .groupBy(tokenCol)
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * denom >= total)
      .select(col(tokenCol).as("token"), col("n_occurrences"))
  }
}
