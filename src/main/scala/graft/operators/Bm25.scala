package graft.operators

import graft.operators.Embed.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval (SURVEY §2.6 r2) — the lexical complement to
  * the vector kNN family: the reference retrieves by embedding
  * similarity only (chroma.py:96-106); production retrieval stacks pair
  * that with a BM25 arm (hybrid search) because rare exact terms beat
  * approximate semantics on keyword-ish queries.
  *
  * Shape (all inverted-index equi-joins, never query×corpus):
  * term frequencies from one exploded-token aggregation; document
  * frequencies from one more; query terms join DF (broadcast — queries
  * are tiny), then hit the TF table on the term key, so per-query work
  * is bounded by posting-list sizes. Scoring joins are followed by one
  * (query, doc) aggregation and the custom TopKPerKey ranking.
  *
  * Ranking uses the 4-dp ROUNDED score (ties broken by doc_id): ln()
  * is the one non-portable primitive here (last-ulp divergence between
  * libm builds), and ranking on rounded values keeps the top-k set
  * identical across engines — the same policy as the m3 NDCG oracle.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** The (doc_id, term, tf, dl) term-frequency table — ONE exploded-
    * token aggregation, eagerly materialized (localCheckpoint, not a
    * lazy cache): tf feeds the df aggregate, the corpus stats, AND the
    * scoring join — and the broadcast subjobs race the main job, so a
    * lazy cache gets materialized 2-3x concurrently (the same race
    * Dedup's cap design dodges). Exposed so callers can derive query
    * generation / PRF / rank-agreement from the SAME single tokenize
    * pass instead of re-exploding the corpus per component. A real
    * cluster with preemptible executors would use reliable
    * checkpoint(dir) instead. */
  def tfTable(docs: DataFrame, textCol: String): DataFrame =
    graft.Dist.spread(
      docs.select(col("doc_id"), tokens(col(textCol)).as("tk")))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), size(col("tk")).as("dl"),
        explode(col("tk")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      .localCheckpoint()

  /** The tf table persisted as parquet, fit-or-load keyed by the
    * caller's dataset tag (the v8-centroids pattern): an inverted
    * index is an OFFLINE artifact — chroma builds its collection once
    * and serves queries from it (/root/reference/src/db.py:16-52);
    * re-deriving the index inside every lexical query charges the
    * build to each serve. First call tokenizes + writes; later calls
    * are one parquet scan. */
  def tfTableCached(docs: DataFrame, textCol: String,
                    datasetTag: String): DataFrame =
    FitOrLoad.parquet(docs.sparkSession, "bm25tf", datasetTag,
      s"col=$textCol", docs.count())(tfTable(docs, textCol))

  /** docs: (doc_id, textCol); queries: (query_id, queryCol).
    * Emits (query_id, doc_id, score, rnk), top `k` docs per query by
    * BM25 with Lucene's +1 idf floor: idf = ln(1 + (N-df+0.5)/(df+0.5)).
    */
  def search(docs: DataFrame, textCol: String, queries: DataFrame,
             queryCol: String, k: Int): DataFrame =
    searchFromTf(tfTable(docs, textCol), queries, queryCol, k)

  /** BM25 over a prebuilt tf table (see tfTable). */
  def searchFromTf(tf: DataFrame, queries: DataFrame,
                   queryCol: String, k: Int): DataFrame = {
    // corpus constants derived FROM tf (identical values: every doc
    // with >= 1 token has tf rows, and avg-of-dl is the same exact
    // BIGINT sum/count either way — bit-identical in the oracle)
    val stats = tf.groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // distinct query terms with global df + idf — tiny, broadcast into
    // the posting join
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(tokens(col(queryCol)))).as("term"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // qdf is |queries|x|terms| tiny; eager-checkpointing it runs the
    // query-generation lineage exactly once and makes the broadcast
    // build instant instead of a subjob racing the main job
    val qdf = qterms.join(df, "term").crossJoin(stats)
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .localCheckpoint()
    val scored = tf.join(broadcast(qdf), "term")
      .withColumn("part",
        col("idf") * (col("tf") * (K1 + 1.0))
          / (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("part"), 4).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("score").desc, col("doc_id").asc), k)
  }
}
