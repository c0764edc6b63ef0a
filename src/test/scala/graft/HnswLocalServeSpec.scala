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

  test("fromArtifacts refuses an edge table over the edge-row ceiling " +
      "even when the corpus passes the vector guard (r17 advice)") {
    import spark.implicits._
    // a corpus comfortably under maxRows=8 ...
    val corpus = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding").as("v"))
    // ... paired with an edge artifact past 8 × EdgeRowsPerVector rows
    // (a malformed / wrong-corpus artifact: a well-formed M(12)-bounded
    // graph always fits ≤16 rows/vector). The OLD guard checked only
    // the corpus, so this load passed and OOM'd later on the boxed
    // per-src edge buffers — the larger driver-heap structure.
    val ceiling = 8L * graft.operators.HnswLocalServer.EdgeRowsPerVector
    val bloated = spark.range(ceiling + 1)
      .select(lit(0).as("layer"), (col("id") % 8).as("src"),
        ((col("id") + 1) % 8).as("dst"))
    val ex = intercept[IllegalArgumentException] {
      graft.operators.HnswLocalServer.fromArtifacts(
        bloated, corpus, VectorQueries.rpWeightsPair,
        VectorQueries.HnswMaxLevel, VectorQueries.HnswProbes,
        VectorQueries.HnswBeam, VectorQueries.HnswHopsUpper,
        VectorQueries.HnswHopsZero, VectorQueries.K, maxRows = 8L)
    }
    assert(ex.getMessage.contains("HNSW edge table") &&
      ex.getMessage.contains("sharding seam"),
      s"refusal must name the edge table and the sharding seam: ${ex.getMessage}")
  }
}
