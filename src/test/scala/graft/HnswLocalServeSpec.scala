package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Parity pin for the driver-side HNSW serving runtime: the local
  * walk must produce BIT-IDENTICAL results to the distributed hg2
  * walk — same seeds, same descent, same rounding, same tie-breaks —
  * so its latency win never comes at a recall cost. Any drift between
  * the two implementations (a changed hop schedule, a different
  * rounding mode, a tie broken the other way) fails here on the real
  * fixture before it ships in LATENCY artifacts.
  */
class HnswLocalServeSpec extends SparkSpec {

  test("local server matches the distributed hg2 walk row-for-row") {
    val corpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 8)
      .select(col("vec_id"), col("embedding").as("v"))
    val edges = VectorQueries.hg1HnswBuild(spark, sf).localCheckpoint()
    val server = graft.operators.HnswLocalServer.fromArtifacts(
      edges, corpus, VectorQueries.rpWeightsPair,
      VectorQueries.HnswMaxLevel, VectorQueries.HnswProbes,
      VectorQueries.HnswBeam, VectorQueries.HnswHopsUpper,
      VectorQueries.HnswHopsZero, VectorQueries.K)

    val queries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val vis = graft.operators.HnswIndex.visitedStates(queries, edges,
      corpus, VectorQueries.HnswMaxLevel, VectorQueries.HnswHopsUpper,
      VectorQueries.HnswHopsZero, VectorQueries.HnswBeam,
      Some(graft.operators.VectorSearch.knnLshRpMultiProbe(
        queries, corpus, VectorQueries.HnswBeam,
        VectorQueries.rpWeightsPair, VectorQueries.HnswProbes)
        .join(queries, "query_id")
        .select(col("query_id"), col("qv"), col("vec_id").as("node"))))
    val distributed = graft.operators.HnswIndex
      .resultsFromVisited(vis, edges, corpus, VectorQueries.K)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

    val local = queries.collect().flatMap { r =>
      val qid = r.getLong(0)
      server.search(r.getSeq[Float](1).toArray).map {
        case (id, sc, rnk) => (qid, id, sc, rnk)
      }
    }.toSet

    assert(local.nonEmpty, "local serve returned nothing")
    assert(local == distributed,
      s"local-vs-distributed drift:\nonly-local=${local -- distributed}\n" +
        s"only-dist=${distributed -- local}")
  }
}
