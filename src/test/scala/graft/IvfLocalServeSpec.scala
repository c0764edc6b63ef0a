package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Parity pin for the driver-side IVF serving runtime: the local
  * centroid-scan + cell-scan must produce BIT-IDENTICAL rows to the
  * distributed VectorSearch.knnIvfAssigned — same probe order, same
  * cosine fold, same rounding, same tie-breaks — so the latency win
  * (zero job launches per request) never comes at a recall cost.
  */
class IvfLocalServeSpec extends SparkSpec {

  test("local IVF server matches distributed knnIvfAssigned row-for-row") {
    val centroids = VectorQueries.centroids(spark, sf)
    val corpus = VectorQueries.ivfCorpus(spark, sf)
    val assigned = graft.operators.VectorSearch
      .assignCells(corpus, centroids).localCheckpoint()
    // the fixture centroid ids are vec_id < 16 (Long) — the serving
    // runtime keys cells by Int like kmeansCentroids' output
    val centsI = centroids.select(col("cell_id").cast("int").as("cell_id"),
      col("cv").cast("array<double>").as("cv"))
    val assignedI = assigned.withColumn("cell_id", col("cell_id").cast("int"))
    val server = graft.operators.IvfLocalServer.fromArtifacts(
      assignedI, centsI, VectorQueries.K, 4)

    val queries = VectorQueries.queryVecs(spark, sf)
    val distributed = graft.operators.VectorSearch
      .knnIvfAssigned(queries, assigned, centroids, VectorQueries.K, 4)
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
