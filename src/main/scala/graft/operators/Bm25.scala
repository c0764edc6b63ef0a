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
  * are tiny), then hit the IMPACT-PRUNED posting table on the term key.
  *
  * Two scale decisions make the lexical arm survive corpus-sized
  * posting lists (Zipf head terms have df proportional to N — true of
  * the synthetic fixture's 10k-term vocabulary and of any real crawl):
  *
  * 1. **Impact-ordered static pruning** (Carmel et al.'s index-time
  *    pruning, the offline half of WAND/block-max): each term's
  *    posting list keeps only its `PostingCap` highest-IMPACT entries,
  *    where impact is the idf-independent BM25 factor
  *    tf·(k1+1)/(tf + k1·(1−b + b·dl/avgdl)) — the docs the term can
  *    score highest. idf still uses the FULL df (pruning truncates
  *    lists, it does not re-weight), so per-query scoring work is
  *    ≤ |terms|·cap at ANY corpus size: the sf30→sf100 matched-row
  *    growth drops from a≈1.8 (lists ∝ N) to ~linear in query count
  *    alone once lists saturate the cap. The cap is mirrored verbatim
  *    in the DuckDB oracle (impact rounded to 4 dp, ties by doc_id
  *    asc), so the pruned semantics are hash-checked end to end.
  *    Measured top-5 agreement vs the unpruned ranking at cap=1024:
  *    0.9998 at sf1 (50k docs, 5k queries), 0.9889 at sf10 (500k
  *    docs, 50k queries) — the mechanism is pinned by Bm25Spec's
  *    capped-vs-full fixture tests; the unpruned ranking stays
  *    available as `searchFromTfFull`.
  *
  * 2. **Doc-clustered scoring, zero wide shuffles**: the scored
  *    posting stream (still ~cap×|query terms| rows) never hits the
  *    shuffle fabric. Postings are repartitioned by doc_id (a narrow
  *    ≤ vocab·cap-row exchange), the query-term/idf table is broadcast,
  *    and the per-(query, doc) sum aggregates IN PLACE because
  *    HashPartitioning(doc_id) already satisfies the aggregate's
  *    ClusteredDistribution(query_id, doc_id) — Catalyst plans no
  *    exchange between the posting join and the score aggregation
  *    (asserted by PlanShapeSpec). The aggregated scores then feed the
  *    TopKPerKey operator, whose per-partition bounded heaps shuffle
  *    at most k rows per (query, partition). Before this shape the
  *    sf30 arm shuffled 826M scored rows (15 GB); after, the only
  *    non-trivial exchange is the 9.6M-row pruned posting table.
  *
  * Ranking uses the 4-dp ROUNDED score (ties broken by doc_id): ln()
  * is the one non-portable primitive here (last-ulp divergence between
  * libm builds), and ranking on rounded values keeps the top-k set
  * identical across engines — the same policy as the m3 NDCG oracle.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Static per-term posting bound. 1024 keeps top-5 agreement ≥ 0.98
    * at the measured rungs (see scaladoc) while capping per-query
    * scoring work at |terms|·1024 postings regardless of corpus size;
    * lists shorter than the cap are untouched, so small-fixture
    * results are bit-identical to the unpruned ranking. */
  val PostingCap = 1024

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

  /** avg document length over the tf table — sum/count of the per-doc
    * dl, the exact arithmetic of the oracle's `avg(len(tk))` (BIGINT
    * sum, one double division → bit-identical across engines). */
  private def avgdlOf(tf: DataFrame): DataFrame =
    tf.groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(avg(col("dl")).as("avgdl"))

  /** The idf-independent per-posting BM25 factor, 4-dp rounded — the
    * impact order both engines prune under. Only +,*,/ on exact
    * integer inputs and the shared avgdl: IEEE-deterministic, so the
    * rounded value (and therefore the pruned SET) is identical in
    * Spark and the DuckDB oracle. */
  private def impactCol = round(
    (col("tf") * lit(K1 + 1.0)) /
      (col("tf") + (lit(K1) * (lit(1.0 - B) + ((lit(B) * col("dl")) / col("avgdl"))))),
    4)

  /** Impact-ordered static pruning: per term, the `cap` postings with
    * the highest 4-dp impact (ties by doc_id asc), same schema as the
    * input. One TopKPerKey pass — per-partition bounded heaps, one
    * narrow shuffle of the tf table, output ≤ vocab·cap rows. */
  def prunedTf(tf: DataFrame, cap: Int = PostingCap): DataFrame =
    graft.plans.TopK.perKey(
      tf.crossJoin(broadcast(avgdlOf(tf))).withColumn("impact", impactCol),
      Seq("term"), Seq(col("impact").desc, col("doc_id").asc), cap)
      .select("doc_id", "term", "tf", "dl")

  /** The pruned posting table persisted fit-or-load next to the tf
    * artifact (prefix bm25ptf, keyed by cap + corpus row count): the
    * prune is index-build work — one pass at write time, every query
    * then scans lists bounded by the cap. */
  def prunedTfCached(tf: DataFrame, datasetTag: String,
                     cap: Int = PostingCap): DataFrame =
    FitOrLoad.parquet(tf.sparkSession, "bm25ptf", datasetTag,
      s"cap=$cap", tf.count())(prunedTf(tf, cap))

  /** docs: (doc_id, textCol); queries: (query_id, queryCol).
    * Emits (query_id, doc_id, score, rnk), top `k` docs per query by
    * BM25 with Lucene's +1 idf floor: idf = ln(1 + (N-df+0.5)/(df+0.5)),
    * scored over the impact-pruned postings (PostingCap). */
  def search(docs: DataFrame, textCol: String, queries: DataFrame,
             queryCol: String, k: Int): DataFrame = {
    val tf = tfTable(docs, textCol)
    searchFromTf(tf, queries, queryCol, k)
  }

  /** BM25 over a prebuilt tf table: prunes inline at PostingCap.
    * Callers holding a persisted corpus use prunedTfCached +
    * searchPruned so the prune is paid at index-build time. */
  def searchFromTf(tf: DataFrame, queries: DataFrame,
                   queryCol: String, k: Int): DataFrame =
    searchPruned(tf, prunedTf(tf), queries, queryCol, k)

  /** The UNPRUNED ranking (pre-r17 semantics): every matched posting
    * scored. O(Σ df(term)) per query set — the registered baseline
    * the capped default's agreement is measured against (Bm25Spec);
    * not for corpus-sized deployments. */
  def searchFromTfFull(tf: DataFrame, queries: DataFrame,
                       queryCol: String, k: Int): DataFrame =
    searchPruned(tf, tf, queries, queryCol, k)

  /** BM25 with explicit full/pruned posting tables: corpus stats and
    * df (hence idf) from `tf`; the scoring join reads only `ptf`.
    * See the object scaladoc for the two scale decisions (impact
    * pruning; doc-clustered shuffle-free score aggregation). */
  def searchPruned(tf: DataFrame, ptf: DataFrame, queries: DataFrame,
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
    // repartition postings by doc_id BEFORE the broadcast join: the
    // join preserves the child partitioning, and the (query, doc)
    // aggregation's ClusteredDistribution is satisfied by
    // HashPartitioning(doc_id) — the scored stream aggregates in
    // place, no exchange (PlanShapeSpec pins this plan shape)
    val scored = ptf.repartition(col("doc_id"))
      .join(broadcast(qdf), "term")
      .withColumn("part",
        col("idf") * (col("tf") * (K1 + 1.0))
          / (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("part"), 4).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("score").desc, col("doc_id").asc), k)
  }
}
