package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search operators (SURVEY §2.3).
  *
  * Shapes:
  *  - brute-force kNN: broadcast the (small) query set against the
  *    corpus — the corpus is scanned exactly once with no shuffle on the
  *    join; only the scored candidates shuffle for per-query ranking.
  *  - IVF: corpus pre-assigned to centroid cells; a query probes only
  *    its `nprobe` nearest cells, so the candidate join is an equi-join
  *    on cell id (bounded work per query, shuffle on cell id).
  *  - LSH: sign-bit bucketing; candidate join is an equi-join on bucket.
  *
  * Reference behavior: top-k=5 cosine queries, chroma.py:96-106.
  */
object VectorSearch {

  /** Per-query top-k by `score` (desc for similarities, asc for
    * distances), ties broken by corpus id for determinism.
    */
  private def topK(scored: DataFrame, k: Int, ascending: Boolean): DataFrame = {
    val ord = if (ascending) col("score").asc else col("score").desc
    val w = Window.partitionBy("query_id").orderBy(ord, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .withColumn("score", round(col("score"), 6))
  }

  /** Brute-force kNN: one corpus scan × broadcast queries.
    * queries: (query_id, qv), corpus: (vec_id, v [, ...metadata]).
    */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int,
               score: (Column, Column) => Column,
               ascending: Boolean): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("score", score(col("qv"), col("v")))
      .select("query_id", "vec_id", "score")
    topK(scored, k, ascending)
  }

  def knnCosine(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    knnBrute(queries, corpus, k, Vec.cosine, ascending = false)

  def knnDot(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    knnBrute(queries, corpus, k, Vec.dot, ascending = false)

  def knnL2(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    knnBrute(queries, corpus, k, Vec.l2, ascending = true)

  /** Range search: every corpus vector within cosine radius of a query.
    * The filter runs before ranking/collection — at scale, candidates
    * stream straight out of the corpus scan.
    */
  def rangeSearch(queries: DataFrame, corpus: DataFrame,
                  minCosine: Double): DataFrame =
    corpus.crossJoin(broadcast(queries))
      .withColumn("score", Vec.cosine(col("qv"), col("v")))
      .filter(col("score") >= minCosine)
      .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))

  /** Deterministic cell assignment: nearest of the broadcast `centroids`
    * (cell_id, cv) by L2; ties on cell_id. One corpus scan, no shuffle.
    */
  def assignCells(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cdist").asc, col("cell_id").asc)
    vectors.crossJoin(broadcast(centroids))
      .withColumn("cdist", Vec.l2(col("v"), col("cv")))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") === 1)
      .drop("cdist", "crnk", "cv")
  }

  /** IVF kNN: probe the `nprobe` nearest cells per query, brute-force
    * only inside those cells. Candidate join is an equi-join on cell_id:
    * work per query is bounded by probed-cell population, not corpus
    * size — the 100 TB scale path for kNN.
    */
  def knnIvf(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
             k: Int, nprobe: Int): DataFrame = {
    val assigned = assignCells(corpus, centroids)
    val wq = Window.partitionBy("query_id").orderBy(col("cdist").asc, col("cell_id").asc)
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("cdist", Vec.l2(col("qv"), col("cv")))
      .withColumn("crnk", row_number().over(wq))
      .filter(col("crnk") <= nprobe)
      .select("query_id", "qv", "cell_id")
    val scored = assigned.join(probed, "cell_id")
      .withColumn("score", Vec.cosine(col("qv"), col("v")))
      .select("query_id", "vec_id", "score")
    topK(scored, k, ascending = false)
  }

  /** Sign-bit bucket id from the first `bits` dimensions — the simplest
    * deterministic random-hyperplane LSH (axis-aligned hyperplanes).
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1).cast("double") >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH kNN: queries only meet corpus vectors in the same sign bucket —
    * an equi-join on bucket id. Approximate (a true neighbor in another
    * bucket is missed) but per-bucket work replaces the full cross
    * product.
    */
  def knnLsh(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int): DataFrame = {
    val cb = corpus.withColumn("bucket", signBucket(col("v"), bits))
    val qb = queries.withColumn("bucket", signBucket(col("qv"), bits))
    val scored = cb.join(broadcast(qb), "bucket")
      .withColumn("score", Vec.cosine(col("qv"), col("v")))
      .select("query_id", "vec_id", "score")
    topK(scored, k, ascending = false)
  }
}
