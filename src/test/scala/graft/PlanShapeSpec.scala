package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the scale-critical PLAN SHAPES, not just results: these are
  * the properties that decide whether an operator survives a 100×
  * scale-up, and they regress silently if a refactor changes the plan
  * (correctness gates stay green while the shuffle explodes).
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("v6 centroid assignment aggregates map-side, no window sort") {
    val p = plan(graft.operators.VectorSearch.assignCells(
      VectorQueries.ivfCorpus(spark, sf), VectorQueries.centroids(spark, sf)))
    assert(!p.contains("Window"),
      s"assignment fell back to a window (shuffles |centroids|x rows):\n$p")
    assert(p.contains("min_by") || p.contains("minby"),
      s"expected min_by aggregation in:\n$p")
    // partial aggregation before the exchange: HashAggregate appears
    // below the shuffle, not only above it
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(vec_id")
    assert(exchangeIdx > 0, s"no vec_id exchange found:\n$p")
    assert(p.indexOf("Aggregate", exchangeIdx) >= 0,
      s"no partial aggregate under the exchange:\n$p")
  }

  test("hg1 graph build has no cartesian product; all joins are bucket equi-joins") {
    val p = plan(VectorQueries.hg1HnswBuild(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"HNSW build degenerated to a cartesian product: $p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"HNSW candidate join is not an equi-join: $p")
  }

  test("hg4 delta edges join only through (layer, tbl, bucket) keys") {
    val p = plan(VectorQueries.hg4HnswUpsert(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"delta-edge join is not bucket-bounded: $p")
  }

  test("brute kNN broadcasts queries; corpus is never shuffled for the join") {
    val p = plan(VectorQueries.v1KnnCos(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"queries not broadcast:\n$p")
  }

  test("IVF serve path joins candidates on cell_id with broadcast probes") {
    val p = plan(VectorQueries.v6KnnIvf(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("cell_id"),
      s"cell-probe join is not a broadcast equi-join on cell_id:\n$p")
  }

  test("BM25 score aggregation rides the doc_id partitioning: no exchange " +
      "between the posting join and the (query, doc) sum") {
    // the r17 lexical-arm shape: pruned postings repartition by doc_id,
    // qdf broadcasts, and HashPartitioning(doc_id) satisfies the score
    // aggregate's ClusteredDistribution(query_id, doc_id) — the scored
    // stream (the 826M-row sf30 pole before this shape) must never hit
    // an exchange. Plan-wise: exactly ONE hashpartitioning exchange
    // (the doc_id repartition) below the scoring aggregate, and it
    // carries doc_id, not (query_id, doc_id).
    val docs = graft.operators.TextAnalysis.zipfDocsCached(
      Tables.documents(spark, sf).select("doc_id", "text"), "text", sf)
    val tf = graft.operators.Bm25.tfTableCached(docs, "text", sf)
    val queries = graft.operators.TextAnalysis.zipfQueriesCached(tf, sf)
      .select(col("doc_id").as("query_id"), col("query"))
    val p = plan(graft.operators.Bm25.searchPruned(
      tf, graft.operators.Bm25.prunedTfCached(tf, sf), queries, "query", 5))
    // the aggregate's own exchange would carry BOTH grouping keys; the
    // only query_id exchange allowed is TopKPerKey's post-heap merge.
    // Match on attribute NAMES, not `#\d+,` adjacency: Long attributes
    // render with a type suffix (query_id#123L), which made the old
    // comma-anchored regex unable to match ANY real exchange (r17
    // advice) — the assertion was vacuously green.
    val exchanges = p.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(!exchanges.exists(l => l.contains("query_id#") && l.contains("doc_id#")),
      s"score aggregation re-shuffled the scored stream:\n$p")
    assert(exchanges.exists(l => l.contains("doc_id#") && !l.contains("query_id#")),
      s"expected the narrow doc_id posting repartition in:\n$p")
  }

  test("v19 dense arm joins through broadcast probe keys, no cartesian") {
    val p = plan(graft.queries.CorpusQueries.v19HybridAnn(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"ANN hybrid degenerated to a cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"ANN candidate join is not an equi-join:\n$p")
    // the probe-key and query-vector joins are both map-side broadcasts
    assert(p.contains("BroadcastHashJoin"),
      s"probe join not broadcast:\n$p")
  }

  test("q2 filter and projection reach the parquet scan") {
    val p = plan(graft.queries.Relational.q2FilterAgg(spark, sf))
    assert(p.contains("PushedFilters: ["), s"no pushed filters:\n$p")
    assert(!p.contains("PushedFilters: []"), s"empty pushed filters:\n$p")
  }

  test("q3 star join broadcasts every dimension (single fact shuffle)") {
    val p = plan(graft.queries.Relational.q3Join5(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 4, s"expected >=4 broadcast dim joins, got $broadcasts:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"star join shuffles too much ($shuffles exchanges):\n$p")
  }

  test("multi-table LSH dedups candidates with a partial aggregation") {
    val p = plan(VectorQueries.v7KnnLsh(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"bucket join should broadcast the query side:\n$p")
    assert(!p.contains("CartesianProduct"), s"LSH must never cross-join:\n$p")
  }

  test("dedup pair generation never plans a cartesian product") {
    Seq(
      graft.queries.CorpusQueries.d2NgramJaccard(spark, sf),
      graft.queries.CorpusQueries.d3Minhash(spark, sf),
      VectorQueries.d6NearDupLsh(spark, sf)
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        s"dedup candidate join degenerated to all-pairs:\n$p")
    }
  }

  test("fuzzy join blocks on an equi-key — never a cartesian product") {
    val p = plan(graft.queries.Relational.fj1FuzzyJoin(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"fuzzy join degenerated to all-pairs:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on the block key:\n$p")
  }

  test("bm25 broadcasts query terms and scores from the materialized tf") {
    val p = plan(graft.queries.CorpusQueries.b2Bm25(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"query-term/posting join should broadcast the tiny side:\n$p")
    // tf is eagerly localCheckpoint'ed (shows as an ExistingRDD scan):
    // a lazy cache here gets double-materialized by the broadcast
    // subjob racing the main job
    assert(p.contains("Scan ExistingRDD"),
      s"tf not checkpointed — stats/df/scoring re-tokenize the corpus:\n$p")
  }

  test("tfidf keyword extraction broadcasts the doc-count and materializes tf") {
    val p = plan(graft.queries.CorpusQueries.t9TfidfKeywords(spark, sf))
    assert(p.contains("Scan ExistingRDD"),
      s"tf not checkpointed:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"doc-count should ride in as a broadcast:\n$p")
  }

  test("v16 Hamming kNN broadcasts query codes and runs the custom TopK") {
    val p = plan(VectorQueries.v16KnnHamming(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query codes not broadcast:\n$p")
    assert(p.contains("LocalTopK") || p.contains("TopKMerge"),
      s"ranking did not run on the bounded-heap operator:\n$p")
  }

  test("dc1 source cap runs bounded heaps, not a per-source sort window") {
    val p = plan(graft.queries.CorpusQueries.dc1SourceCap(spark, sf))
    assert(p.contains("LocalTopK") || p.contains("TopKMerge"),
      s"cap did not run on the bounded-heap operator:\n$p")
    assert(!p.contains("Window"),
      s"cap fell back to a window sort:\n$p")
  }

  test("wc1 pair generation is map-side: exactly the two count shuffles + topk merge") {
    val p = plan(graft.queries.CorpusQueries.wc1Cooccurrence(spark, sf))
    assert(!p.contains("SortMergeJoin"),
      s"pair generation must not self-join the token table:\n$p")
    // unigram counts ride in as broadcast joins onto the pair counts
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"unigram counts not broadcast:\n$p")
  }

  test("fp1 fingerprint aggregates map-side with no shuffle before the final merge") {
    val p = plan(graft.queries.Relational.fp1Fingerprint(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      s"fingerprint should need only the single-partition final merge:\n$p")
  }

  test("ord1 global rank serves from checkpointed partials + pid offsets, no window") {
    val p = plan(graft.queries.Relational.ord1GlobalRank(spark, sf))
    // the range-partition + per-partition window live inside the
    // checkpointed sub-plan (Scan ExistingRDD); the SERVING plan is a
    // pure map: local rank + a codegen'd __pid offset chain — in
    // particular NO window at all, so nothing funnels into one task
    assert(p.contains("Scan ExistingRDD"), s"missing checkpointed partials:\n$p")
    assert(p.contains("__pid"), s"missing partition-offset shift:\n$p")
    assert(!p.contains("Window"), s"serving plan must not re-window:\n$p")
  }

  test("q18 deciles rank DECIMAL spend, not a double sum") {
    val q = graft.queries.Relational.q18Deciles(spark, sf)
    val analyzed = q.queryExecution.analyzed.toString
    assert(analyzed.contains("decimal(18,2)"),
      s"per-customer spend must be an exact decimal:\n$analyzed")
  }

  test("iv1 interval join is an equi-join on (user, bucket), never a theta join") {
    val p = plan(graft.queries.Relational.iv1IntervalJoin(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a theta join:\n$p")
    // the hash-join keys must include both the user and the time bucket
    // (the range predicate rides along as the join condition's filter)
    val joinLine = p.split("\n").find(_.contains("HashJoin")).getOrElse("")
    assert(joinLine.contains("user_id") && joinLine.contains("bkt"),
      s"equi keys must be (user_id, bkt):\n$joinLine")
  }

  test("pp1 answers count/min/max from parquet footer stats (PushedAggregation)") {
    val p = plan(graft.queries.Relational.pp1PushdownMinmax(spark, sf))
    assert(p.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate not pushed to the parquet scan:\n$p")
    assert(p.contains("MIN(l_extendedprice)") && p.contains("MAX(l_quantity)"),
      s"min/max not pushed:\n$p")
  }

  test("ed1 candidate generation joins on the deletion variant, verify is a filter") {
    val p = plan(graft.queries.Relational.ed1EditDistanceJoin(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"deletion-neighborhood join degenerated to all-pairs:\n$p")
    assert(p.contains("levenshtein"), s"missing exact verify filter:\n$p")
  }

  test("sk2 salted agg is two-phase: a (key, salt) exchange under a bare-key exchange") {
    val p = plan(graft.queries.Relational.sk2SkewSaltedAgg(spark, sf))
    // phase 1 partials shuffle on (skew_key, __salt) — the hot key is
    // spread over the salt space BEFORE any reducer sees it whole
    val saltEx = p.split("\n").filter(l =>
      l.contains("Exchange hashpartitioning") && l.contains("__salt"))
    assert(saltEx.nonEmpty, s"no (key, salt) exchange — salting lost:\n$p")
    // phase 2 combines on the bare key: a second exchange WITHOUT __salt
    val bareEx = p.split("\n").filter(l =>
      l.contains("Exchange hashpartitioning") && l.contains("skew_key") &&
        !l.contains("__salt"))
    assert(bareEx.nonEmpty, s"no bare-key combine exchange:\n$p")
    // the unsalted control stays single-phase (exactly one exchange)
    val p3 = plan(graft.queries.Relational.sk3SkewPlainAgg(spark, sf))
    assert("Exchange hashpartitioning".r.findAllIn(p3).size == 1,
      s"sk3 control must be the plain one-exchange aggregation:\n$p3")
  }

  test("hg5 compaction rescoring is equi-join only — no candidate regeneration") {
    val p = plan(VectorQueries.hg5HnswCompact(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"compaction rescoring degenerated past an equi-join:\n$p")
  }

  test("prebucketed LSH serving probes the bucket artifact, never re-explodes the corpus") {
    import graft.operators.VectorSearch
    val corpus = VectorQueries.corpusVecs(spark, sf)
    val cb = VectorSearch.rpBuckets(corpus, VectorQueries.rpWeightsPair)
      .localCheckpoint()
    val q = VectorQueries.queryVecs(spark, sf)
    val p = plan(VectorSearch.knnLshRpMultiProbeFrom(
      cb, q, 8, VectorQueries.rpWeightsPair, 1))
    // the corpus side must be the checkpointed bucket artifact...
    assert(p.contains("Scan ExistingRDD"),
      s"bucket table not served from the checkpoint:\n$p")
    // ...and the only Generates are the QUERY side's probe expansion
    // (bucket posexplode + mask explode). A third Generate means the
    // O(N*tables) corpus re-explosion crept back into the request path.
    val generates = "Generate ".r.findAllIn(p).size
    assert(generates <= 2,
      s"corpus re-exploded per request ($generates Generates):\n$p")
  }
}
