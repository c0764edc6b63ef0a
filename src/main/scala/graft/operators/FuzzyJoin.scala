package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) join (SURVEY §2.7 fj1) — entity
  * resolution / dirty-key joining: match strings within Levenshtein
  * `maxDist` WITHOUT the quadratic cross join.
  *
  * Blocking: candidates must share the first character and differ in
  * length by at most `maxDist` — an equi-join on the prefix plus a
  * band predicate, so the shuffle key is the block and per-block work
  * is bounded by block sizes (the standard record-linkage shape; at
  * 100 TB add a second blocking pass on, e.g., a phonetic key for
  * recall on first-character typos — the documented tradeoff of
  * prefix blocking is that it misses edits in position 0).
  *
  * The expensive levenshtein() only runs inside blocks, and Spark's
  * builtin takes the threshold parameter so the dynamic-programming
  * band is O(maxDist·n) per pair, not O(n²).
  */
object FuzzyJoin {

  /** left(leftCol) ⋈ right(rightCol) where levenshtein <= maxDist.
    * Emits every left column + every right column + `dist`. */
  def joinByEditDistance(left: DataFrame, leftCol: String,
                         right: DataFrame, rightCol: String,
                         maxDist: Int): DataFrame = {
    val l = left.withColumn("__blk", substring(col(leftCol), 1, 1))
      .withColumn("__len", length(col(leftCol)))
    val r = right.withColumn("__blk", substring(col(rightCol), 1, 1))
      .withColumn("__rlen", length(col(rightCol)))
    // 3-arg levenshtein: the banded DP early-outs at the threshold and
    // returns -1 above it — O(maxDist·n) per pair instead of O(n²)
    l.join(r, l("__blk") === r("__blk") &&
        abs(col("__len") - col("__rlen")) <= maxDist)
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .drop("__blk", "__len", "__rlen")
  }
}
