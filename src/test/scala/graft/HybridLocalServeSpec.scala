package graft

import graft.operators.{Bm25, Embed, FitOrLoad, HybridLocalServer, TextAnalysis, VectorSearch}
import graft.queries.{CorpusQueries, VectorQueries}
import org.apache.spark.sql.functions._

/** Bit-exact parity between the driver-side HybridLocalServer and the
  * distributed v19_hybrid_ann over EVERY fixture query — the same
  * contract IvfLocalServeSpec/HnswLocalServeSpec pin for their
  * families: the local runtime is a serving deployment of the same
  * artifacts and conventions, not a re-tuned approximation. */
class HybridLocalServeSpec extends SparkSpec {

  private lazy val docs = TextAnalysis.zipfDocsCached(
    Tables.documents(spark, sf).select("doc_id", "text"), "text", sf)
  private lazy val tf = Bm25.tfTableCached(docs, "text", sf)
  private lazy val queries = TextAnalysis.zipfQueriesCached(tf, sf)
    .select(col("doc_id").as("query_id"), col("query"))

  private lazy val server = {
    val bits = VectorQueries.pairBits(VectorQueries.docCount(spark, sf))
    val w = VectorQueries.pairWeights(bits).take(CorpusQueries.HybridTables)
    val dEmb = Embed.embedDocsCached(docs, "text", CorpusQueries.HybridDim, sf)
      .select(col("doc_id").as("vec_id"), col("embedding").as("v"))
    val cb = FitOrLoad.parquet(spark, "vixcb", sf,
      s"dim=${CorpusQueries.HybridDim};tables=${CorpusQueries.HybridTables};bits=$bits",
      docs.count())(VectorSearch.rpBuckets(dEmb, w))
    HybridLocalServer.fromArtifacts(tf, cb, w,
      CorpusQueries.HybridArmK, CorpusQueries.HybridK)
  }

  test("hybrid_local == distributed v19_hybrid_ann, every query, bit-exact") {
    val batch = CorpusQueries.v19HybridAnn(spark, sf)
      .select("query_id", "doc_id", "rrf_score", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    val qs = queries.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(qs.nonEmpty)
    var checked = 0
    qs.foreach { case (qid, text) =>
      val local = server.search(text).map { case (d, s, r) => (qid, d, s, r) }
      val expect = batch(qid).sortBy(_._4)
      assert(local.toSeq == expect.toSeq,
        s"query $qid '$text': local=${local.toSeq} batch=${expect.toSeq}")
      checked += 1
    }
    assert(checked == batch.size)
  }

  test("per-request latency is job-free in-process compute") {
    val q = queries.head().getString(1)
    server.search(q) // warm (JIT)
    val t0 = System.nanoTime()
    val n = 50
    (1 to n).foreach(_ => server.search(q))
    val perReqMs = (System.nanoTime() - t0) / 1e6 / n
    // generous bound: the point is no 300 ms Spark-job floor per request
    assert(perReqMs < 100.0, f"per-request $perReqMs%.1f ms")
  }
}
