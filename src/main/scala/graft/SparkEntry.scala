package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CorpusQueries, IngestQueries, MetricQueries, Relational, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §6
  * (oracle conventions). Every implemented operator registers here:
  * `queries(name)(spark, sfDir)` produces the result DataFrame and
  * `oracleSql(name)` is the equivalent DuckDB SQL over the same parquet
  * tables (omitted only for non-SQL-expressible operators → rows-only
  * check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing"        -> (Relational.q1Pricing _),
    "q2_filter_agg"     -> (Relational.q2FilterAgg _),
    "q3_join5"          -> (Relational.q3Join5 _),
    "q4_exists"         -> (Relational.q4Exists _),
    "q5_window"         -> (Relational.q5Window _),
    "q6_rollup"         -> (Relational.q6Rollup _),
    "q7_topk_per_group" -> (Relational.q7TopkPerGroup _),
    "q8_topk_native"    -> (Relational.q8TopkNative _),
    "q9_running_total"  -> (Relational.q9RunningTotal _),
    "q10_distinct"      -> (Relational.q10Distinct _),
    "j1_json_extract"   -> (Relational.j1JsonExtract _),
    "o1_anti_join"      -> (Relational.o1AntiJoin _),
    "p1_pivot"          -> (Relational.p1Pivot _),
    "b1_range_join"     -> (Relational.b1RangeJoin _),
    "c1_cube"           -> (Relational.c1Cube _),
    "q11_above_avg"     -> (Relational.q11AboveAvg _),
    "u2_set_ops"        -> (Relational.u2SetOps _),
    "m4_approx_pcts"    -> (Relational.m4ApproxPcts _),
    "a1_asof"           -> (Relational.a1Asof _),
    "e1_events_window"  -> (Relational.e1EventsWindow _),
    "e2_sessions"       -> (Relational.e2Sessions _),
    "vf_norm"           -> (VectorQueries.vfNorm _),
    "vf_pairwise"       -> (VectorQueries.vfPairwise _),
    "v0_embed"          -> (VectorQueries.v0Embed _),
    "v1_knn_cos"        -> (VectorQueries.v1KnnCos _),
    "v2_knn_dot"        -> (VectorQueries.v2KnnDot _),
    "v3_knn_l2"         -> (VectorQueries.v3KnnL2 _),
    "v4_knn_filtered"   -> (VectorQueries.v4KnnFiltered _),
    "v5_range_search"   -> (VectorQueries.v5Range _),
    "v6_knn_ivf"        -> (VectorQueries.v6KnnIvf _),
    "v7_knn_lsh"        -> (VectorQueries.v7KnnLsh _),
    "v8_knn_ivf_kmeans" -> (VectorQueries.v8KnnIvfKmeans _),
    "d5_embed_neardup"  -> (VectorQueries.d5EmbedNearDup _),
    "d1_exact_dedup"    -> (CorpusQueries.d1ExactDedup _),
    "d2_ngram_jaccard"  -> (CorpusQueries.d2NgramJaccard _),
    "d3_minhash"        -> (CorpusQueries.d3Minhash _),
    "d4_simhash"        -> (CorpusQueries.d4Simhash _),
    "t1_tokens"         -> (CorpusQueries.t1Tokens _),
    "t2_quality"        -> (CorpusQueries.t2Quality _),
    "t3_langid"         -> (CorpusQueries.t3LangId _),
    "t4_fingerprint"    -> (CorpusQueries.t4Fingerprint _),
    "q0_querygen"       -> (CorpusQueries.q0QueryGen _),
    "u1_upsert"         -> (CorpusQueries.u1Upsert _),
    "s1_stratified"     -> (CorpusQueries.s1Stratified _),
    "s2_det_shuffle"    -> (CorpusQueries.s2DetShuffle _),
    "t5_vocab"          -> (CorpusQueries.t5Vocab _),
    "m1_latency_pcts"   -> (MetricQueries.m1LatencyPcts _),
    "m2_recall_at_k"    -> (MetricQueries.m2Recall _),
    "m3_ndcg_at_k"      -> (MetricQueries.m3Ndcg _),
    "m0_ir_summary"     -> (MetricQueries.m0IrSummary _),
    "r1_relevancy"      -> (MetricQueries.r1Relevancy _),
    "ing_csv"           -> (IngestQueries.ingCsv _),
    "ing_docs"          -> (IngestQueries.ingDocs _),
    "mm1_meta"          -> (IngestQueries.mm1Meta _),
    "mm2_framesample"   -> (IngestQueries.mm2FrameSample _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing"        -> Relational.q1Sql,
    "q2_filter_agg"     -> Relational.q2Sql,
    "q3_join5"          -> Relational.q3Sql,
    "q4_exists"         -> Relational.q4Sql,
    "q5_window"         -> Relational.q5Sql,
    "q6_rollup"         -> Relational.q6Sql,
    "q7_topk_per_group" -> Relational.q7Sql,
    "q8_topk_native"    -> Relational.q7Sql, // same semantics, custom operator
    "q9_running_total"  -> Relational.q9Sql,
    "q10_distinct"      -> Relational.q10Sql,
    "j1_json_extract"   -> Relational.j1Sql,
    "o1_anti_join"      -> Relational.o1Sql,
    "p1_pivot"          -> Relational.p1Sql,
    "b1_range_join"     -> Relational.b1Sql,
    "c1_cube"           -> Relational.c1Sql,
    "q11_above_avg"     -> Relational.q11Sql,
    "u2_set_ops"        -> Relational.u2Sql,
    // m4_approx_pcts: rows-only — sketch percentiles are engine-specific
    "a1_asof"           -> Relational.a1Sql,
    "e1_events_window"  -> Relational.e1Sql,
    "e2_sessions"       -> Relational.e2Sql,
    "vf_norm"           -> VectorQueries.vfNormSql,
    "vf_pairwise"       -> VectorQueries.vfPairwiseSql,
    "v0_embed"          -> VectorQueries.v0Sql,
    "v1_knn_cos"        -> VectorQueries.v1Sql,
    "v2_knn_dot"        -> VectorQueries.v2Sql,
    "v3_knn_l2"         -> VectorQueries.v3Sql,
    "v4_knn_filtered"   -> VectorQueries.v4Sql,
    "v5_range_search"   -> VectorQueries.v5Sql,
    "v6_knn_ivf"        -> VectorQueries.v6Sql,
    "v7_knn_lsh"        -> VectorQueries.v7Sql,
    "d5_embed_neardup"  -> VectorQueries.d5Sql,
    "d1_exact_dedup"    -> CorpusQueries.d1Sql,
    "d2_ngram_jaccard"  -> CorpusQueries.d2Sql,
    "d3_minhash"        -> CorpusQueries.d3Sql,
    "d4_simhash"        -> CorpusQueries.d4Sql,
    "t1_tokens"         -> CorpusQueries.t1Sql,
    "t2_quality"        -> CorpusQueries.t2Sql,
    "t3_langid"         -> CorpusQueries.t3Sql,
    "t4_fingerprint"    -> CorpusQueries.t4Sql,
    "q0_querygen"       -> CorpusQueries.q0Sql,
    "u1_upsert"         -> CorpusQueries.u1Sql,
    "s1_stratified"     -> CorpusQueries.s1Sql,
    "s2_det_shuffle"    -> CorpusQueries.s2Sql,
    "t5_vocab"          -> CorpusQueries.t5Sql,
    "m1_latency_pcts"   -> MetricQueries.m1Sql,
    "m2_recall_at_k"    -> MetricQueries.m2Sql,
    "m3_ndcg_at_k"      -> MetricQueries.m3Sql,
    "m0_ir_summary"     -> MetricQueries.m0Sql,
    "r1_relevancy"      -> MetricQueries.r1Sql,
    "ing_csv"           -> IngestQueries.ingCsvSql,
    "ing_docs"          -> IngestQueries.ingDocsSql,
    "mm1_meta"          -> IngestQueries.mm1Sql,
    "mm2_framesample"   -> IngestQueries.mm2Sql,
  )
}
