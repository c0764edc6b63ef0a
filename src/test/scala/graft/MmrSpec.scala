package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** MMR re-ranking + int8 quantization invariants (SURVEY §2.3
  * v10/vq1). */
class MmrSpec extends SparkSpec {

  test("v10 MMR: first pick is the most relevant; k unique picks per query") {
    val mmr = VectorQueries.v10Mmr(spark, sf).cache()
    val brute = VectorQueries.v1KnnCos(spark, sf)
    // pick 1 == brute-force rank 1 (maxSim term is zero for the first pick)
    val firstPicks = mmr.filter(col("pick") === 1)
      .select(col("query_id"), col("vec_id").as("mmr_first"))
    val top1 = brute.filter(col("rnk") === 1)
      .select(col("query_id"), col("vec_id").as("brute_first"))
    assert(firstPicks.join(top1, "query_id")
      .filter(col("mmr_first") =!= col("brute_first")).count() == 0)
    // exactly MmrK unique picks per query
    val per = mmr.groupBy("query_id")
      .agg(count(lit(1)).as("n"), countDistinct("vec_id").as("nd"))
    assert(per.filter(col("n") =!= VectorQueries.MmrK || col("nd") =!= VectorQueries.MmrK)
      .count() == 0)
    // mmr picks differ from the plain top-MmrK for at least one query
    // (diversification does something on this fixture)
    val plain = brute.filter(col("rnk") <= VectorQueries.MmrK)
      .select("query_id", "vec_id")
    assert(mmr.select("query_id", "vec_id").exceptAll(plain).count() > 0)
  }

  test("vq1 int8 quantization: codes in [-127,127], max code hits 127, reconstruction tracks") {
    val q = VectorQueries.vq1Quantize(spark, sf).cache()
    assert(q.filter(col("qval") > 127 || col("qval") < -127).count() == 0)
    // every vector's largest |code| is 127 (the max element maps to it)
    val perVec = q.groupBy("vec_id").agg(max(abs(col("qval"))).as("m"))
    assert(perVec.filter(col("m") =!= 127).count() == 0)
    // kNN on dequantized vectors largely agrees with exact kNN
    val e = Tables.embeddings(spark, sf)
    val deq = e.select(col("vec_id"),
      graft.functions.Vec.dequantizeI8(
        graft.functions.Vec.quantizeI8(col("embedding")),
        greatest(array_max(org.apache.spark.sql.functions.transform(
          col("embedding"), x => abs(x.cast("double")))), lit(1e-30))).as("v"))
    val qv = deq.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cv = deq.filter(col("vec_id") >= 8)
    val quantKnn = graft.operators.VectorSearch.knnCosine(qv, cv, VectorQueries.K)
      .select("query_id", "vec_id")
    val exact = VectorQueries.v1KnnCos(spark, sf).select("query_id", "vec_id")
    val overlap = quantKnn.intersect(exact).count().toDouble / exact.count()
    assert(overlap >= 0.8, s"quantized kNN overlap $overlap")
  }
}
