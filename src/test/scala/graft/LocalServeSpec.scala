package graft

import graft.operators.LocalServe
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-JVM admission guard of the Local*Server serving tiers
  * (r16 verdict task 6): a load beyond the per-node ceiling must be
  * REFUSED at artifact-load time with a message naming the per-cell
  * sharding seam — not discovered as an executor-side OOM after the
  * collect. */
class LocalServeGuardSpec extends AnyFunSuite {

  test("guard admits up to the ceiling and refuses beyond it, naming " +
      "the sharding seam") {
    LocalServe.guard(LocalServe.MaxRowsPerJvm, "at-ceiling load")
    val e = intercept[IllegalArgumentException] {
      LocalServe.guard(LocalServe.MaxRowsPerJvm + 1, "oversized load")
    }
    assert(e.getMessage.contains("sharding seam"),
      s"refusal must point at the sharding story: ${e.getMessage}")
    assert(e.getMessage.contains("oversized load"))
  }
}

/** Integration half: the IVF server's artifact load path routes
  * through the guard (the other two servers share the same helper
  * with the same default ceiling). */
class LocalServeGuardIntegrationSpec extends SparkSpec {

  test("IvfLocalServer.fromArtifacts refuses a corpus over maxRows") {
    val centroids = VectorQueries.centroids(spark, sf)
    val corpus = VectorQueries.ivfCorpus(spark, sf)
    val assigned = graft.operators.VectorSearch
      .assignCells(corpus, centroids).localCheckpoint()
    val centsI = centroids.select(col("cell_id").cast("int").as("cell_id"),
      col("cv").cast("array<double>").as("cv"))
    val assignedI = assigned.withColumn("cell_id", col("cell_id").cast("int"))
    val e = intercept[IllegalArgumentException] {
      graft.operators.IvfLocalServer.fromArtifacts(
        assignedI, centsI, VectorQueries.K, 4, maxRows = 1L)
    }
    assert(e.getMessage.contains("sharding seam"))
    // and the default ceiling admits the fixture corpus
    val server = graft.operators.IvfLocalServer.fromArtifacts(
      assignedI, centsI, VectorQueries.K, 4)
    assert(server != null)
  }
}
