package graft

import graft.operators.{Bm25, Embed, FitOrLoad, HybridLocalServer, ShardedHybridServer, TextAnalysis, VectorSearch}
import graft.queries.{CorpusQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Pins the sharded HYBRID serving fleet (ShardedHybridServer): the
  * composed case where the lexical arm's per-doc score sums over
  * terms owned by different shards — the router's term-ordered re-sum
  * and dense dedup must reproduce the single-node server (and hence
  * the batch v19_hybrid_ann) bit-exactly, and the per-shard guard
  * must unlock a corpus one JVM refuses.
  */
class ShardedHybridServeSpec extends SparkSpec {

  private lazy val docs = TextAnalysis.zipfDocsCached(
    Tables.documents(spark, sf).select("doc_id", "text"), "text", sf)
  private lazy val tf = Bm25.tfTableCached(docs, "text", sf)
  private lazy val ptf = Bm25.prunedTfCached(tf, sf)
  private lazy val queries = TextAnalysis.zipfQueriesCached(tf, sf)
    .select(col("doc_id").as("query_id"), col("query"))

  private lazy val artifacts = {
    val bits = VectorQueries.pairBits(VectorQueries.docCount(spark, sf))
    val w = VectorQueries.pairWeights(bits).take(CorpusQueries.HybridTables)
    val dEmb = Embed.embedDocsCached(docs, "text", CorpusQueries.HybridDim, sf)
      .select(col("doc_id").as("vec_id"), col("embedding").as("v"))
    val cb = FitOrLoad.parquet(spark, "vixcb", sf,
      s"dim=${CorpusQueries.HybridDim};tables=${CorpusQueries.HybridTables};bits=$bits",
      docs.count())(VectorSearch.rpBuckets(dEmb, w))
    (cb, w)
  }

  test("sharded hybrid fleet == single server == batch v19, every query") {
    val (cb, w) = artifacts
    val single = HybridLocalServer.fromArtifacts(tf, ptf, cb, w,
      CorpusQueries.HybridArmK, CorpusQueries.HybridK)
    val sharded = ShardedHybridServer.fromArtifacts(tf, ptf, cb, w,
      CorpusQueries.HybridArmK, CorpusQueries.HybridK, nShards = 3)

    val batch = CorpusQueries.v19HybridAnn(spark, sf)
      .select("query_id", "doc_id", "rrf_score", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    val qs = queries.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(qs.nonEmpty)
    qs.foreach { case (qid, text) =>
      val sh = sharded.search(text).toSeq
      assert(sh == single.search(text).toSeq,
        s"query $qid '$text': sharded != single")
      val expect = batch(qid).sortBy(_._4).map { case (_, d, s, r) => (d, s, r) }.toSeq
      assert(sh == expect,
        s"query $qid '$text': sharded=$sh batch=$expect")
    }
  }

  test("a hybrid corpus the single-JVM guard refuses loads sharded") {
    val (cb, w) = artifacts
    val ceiling = math.max(cb.count(), ptf.count()) - 1
    val refusal = intercept[IllegalArgumentException] {
      HybridLocalServer.fromArtifacts(tf, ptf, cb, w,
        CorpusQueries.HybridArmK, CorpusQueries.HybridK, maxRows = ceiling)
    }
    assert(refusal.getMessage.contains("single-JVM serving ceiling"))
    val sharded = ShardedHybridServer.fromArtifacts(tf, ptf, cb, w,
      CorpusQueries.HybridArmK, CorpusQueries.HybridK, nShards = 3,
      maxRowsPerShard = ceiling)
    val q = queries.limit(1).collect().head.getString(1)
    assert(sharded.search(q).nonEmpty)
  }

  test("zero-token query serves empty through the fleet") {
    val (cb, w) = artifacts
    val sharded = ShardedHybridServer.fromArtifacts(tf, ptf, cb, w,
      CorpusQueries.HybridArmK, CorpusQueries.HybridK, nShards = 2)
    Seq("", "   ").foreach { q =>
      assert(sharded.search(q).isEmpty)
    }
  }
}
