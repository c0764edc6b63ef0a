package graft

import org.apache.spark.sql.DataFrame

/** Distribution helpers.
  *
  * `spread` repartitions to the session default parallelism. Two jobs:
  *  - a small single-file parquet scan yields ONE partition, serializing
  *    all downstream map work onto one task (at 100 TB the scan has
  *    thousands of splits; locally we must simulate that);
  *  - the Exchange is a materialization barrier: columns computed before
  *    it (e.g. a tokenized array) become real row fields, so later
  *    expressions referencing them do O(1) attribute reads instead of
  *    re-evaluating the producing expression. Interpreted higher-order
  *    functions get no common-subexpression elimination — an
  *    `element_at(split(text), i)` inside a 350-iteration lambda
  *    re-splits the text 350 times without this barrier.
  */
object Dist {
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Collision-free tag for scratch directories derived from a path: a
    * readable sanitized prefix plus the SHA-256 of the UNMODIFIED path.
    * The sanitizer alone is not injective ("/a/b", "/a_b", "/a:b" all
    * sanitize to "_a_b"), so two sf dirs could silently share (and
    * clobber) one scratch dir; the digest restores injectivity. */
  def pathTag(s: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s.replaceAll("[^A-Za-z0-9._-]", "_") + "-" + digest
  }

  /** Two-phase salted aggregation for skewed keys: aggregate on
    * (key, salt) first — spreading one hot key over `salts` reducers —
    * then combine the partials on the bare key. `aggs` must be
    * decomposable (sum/count/min/max); averages decompose into
    * sum+count at the call site.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
           sum(col("__n")).as("n_rows"))
  }
}
