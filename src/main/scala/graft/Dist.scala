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

  /** Distributed running total (prefix sum) over a TOTAL order — the
    * scale-safe replacement for a partitionless window (which drags
    * the whole dataset through ONE task): range-partition on the order
    * keys, run the window per partition (parallel), then shift each
    * partition by the driver-prefix-summed totals of its predecessors
    * (≤ #partitions rows on the driver — index-metadata-sized at any
    * scale). The result depends only on the total order, not on where
    * range boundaries fall, so it is engine- and run-independent.
    *
    * Emits the input columns + `<valueCol>_end` = inclusive running
    * total in (orderCols) order. orderCols must be a total order.
    *
    * valueCol must be an integral, non-null column (sums collect on the
    * driver as Long; doubles would also reorder-sensitively round).
    * Enforced up front so a double/decimal column fails at plan time
    * with a clear message, not as a ClassCastException mid-collect.
    */
  def runningTotal(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
                   valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val vt = df.schema(valueCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"runningTotal: value column '$valueCol' must be integral " +
        s"(got $vt) — exact prefix sums are defined on integers only")
    val p = df.sparkSession.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(p, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__pid")
      .orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val local = sorted.withColumn("__local_end", sum(col(valueCol)).over(w))
      .localCheckpoint() // consumed twice: partition totals + final shift
    // partition total = SUM of the values, NOT max(__local_end): with
    // negative values (e.g. a sweep line's ±1 deltas) the local running
    // sum is non-monotone, so its max is not its final value — the two
    // only coincide for non-negative value columns
    val totals = local.groupBy("__pid").agg(sum(col(valueCol)).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .toMap // all-null-valued partition sums to null → contributes 0
    val prefix = totals.keys.toSeq.sorted
      .scanLeft((Int.MinValue, 0L)) { case ((_, acc), pid) =>
        (pid, acc + totals(pid)) }
      .sliding(2).collect { case Seq((_, acc), (pid, _)) => (pid, acc) }
      .toMap
    local.withColumn(s"${valueCol}_end", col("__local_end") + offsetExpr(prefix))
      .drop("__pid", "__local_end")
  }

  /** Exact global rank (1-based, identical to a partitionless
    * row_number) as a prefix count of ones through runningTotal —
    * range-partitioned, parallel at every stage. orderCols must be a
    * total order. */
  def globalRank(df: DataFrame,
                 orderCols: Seq[org.apache.spark.sql.Column],
                 rankName: String): DataFrame = {
    import org.apache.spark.sql.functions._
    runningTotal(df.withColumn("__one", lit(1)), orderCols, "__one")
      .withColumnRenamed("__one_end", rankName)
      .drop("__one")
  }

  /** Broadcast-join-free partition-offset lookup: a when() chain over
    * ≤ #partitions entries (tiny, codegen'd — no UDF, no join). */
  private def offsetExpr(prefix: Map[Int, Long]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    prefix.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(acc)
    }
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

  /** Salted equi-join for skewed probe keys: the build side is
    * replicated once per salt (×`salts` build rows — fine when the
    * build side is the smaller fact, too big to broadcast but far
    * smaller than the probe), while each probe row picks ONE
    * deterministic pseudo-random salt, so a hot key's probe rows
    * spread over `salts` reducers instead of melting one. Result is
    * row-identical to the plain inner join (every probe row still
    * meets every matching build row exactly once — through its own
    * salt's copy). This is what AQE's skew-join split does adaptively;
    * the explicit form works when skew is KNOWN and stable (training
    * corpora: one language, one domain, one template dominating).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val salted = probe.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
