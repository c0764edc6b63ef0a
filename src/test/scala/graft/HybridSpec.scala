package graft

import graft.operators.Hybrid
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpec {

  private def arm(rows: (Long, Long, Int)*) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "rnk")
  }

  test("doc present in both arms beats single-arm rank-1 docs") {
    val lex = arm((1L, 10L, 1), (1L, 20L, 2))
    val vec = arm((1L, 30L, 1), (1L, 20L, 2))
    // doc 20: 1/62 + 1/62 = 0.032258; docs 10/30: 1/61 = 0.016393
    val res = Hybrid.rrfFuse(Seq(lex, vec), 3)
      .orderBy("rnk").collect()
    assert(res.head.getLong(1) == 20L)
    assert(math.abs(res.head.getDouble(2) - 2.0 / 62.0) < 1e-6)
    assert(res.map(_.getLong(1)).toSeq == Seq(20L, 10L, 30L)) // tie: lower id
  }

  test("fusion score matches the RRF formula exactly") {
    val res = Hybrid.rrfFuse(Seq(arm((7L, 1L, 3))), 1).head()
    val expected = BigDecimal(1.0 / (Hybrid.RrfK + 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res.getDouble(2) == expected)
  }

  test("driver entry: 5 fused results per query, ranks dense") {
    val res = graft.queries.CorpusQueries.v12Hybrid(spark, sf).cache()
    val perQ = res.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx")).collect()
    assert(perQ.nonEmpty)
    assert(perQ.forall(r => r.getLong(1) == 5L && r.getInt(2) == 5))
    // the query's own source doc should usually surface: q0 queries are
    // the doc's top tokens, and both arms see them
    val selfHits = res.filter(col("query_id") === col("doc_id")).count()
    assert(selfHits >= perQ.length / 2, s"only $selfHits/${perQ.length} self-hits")
  }

  test("v19 ANN hybrid: 5 fused results per query, near-v12 agreement") {
    val ann = graft.queries.CorpusQueries.v19HybridAnn(spark, sf).cache()
    val perQ = ann.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx")).collect()
    assert(perQ.nonEmpty)
    assert(perQ.forall(r => r.getLong(1) == 5L && r.getInt(2) == 5))
    // the ANN dense arm may miss bucket-straddling neighbors but must
    // not invent results: fused top-5 should agree with the exact-arm
    // fusion on the overwhelming majority of (query, doc) picks
    val brute = graft.queries.CorpusQueries.v12Hybrid(spark, sf)
      .select("query_id", "doc_id")
    val common = ann.select("query_id", "doc_id").intersect(brute).count()
    val total = perQ.length * 5L
    assert(common >= (total * 9) / 10,
      s"ANN fusion agrees on only $common/$total picks")
    // self-retrieval survives the ANN arm
    val selfHits = ann.filter(col("query_id") === col("doc_id")).count()
    assert(selfHits >= perQ.length / 2, s"only $selfHits/${perQ.length} self-hits")
  }

  test("rk1 RBO: agreement counts bound, rbo within the truncated mass") {
    val rows = graft.queries.CorpusQueries.rk1RankAgreement(spark, sf).collect()
    assert(rows.nonEmpty)
    val maxRbo = (1 to 5).map(d => 0.1 * math.pow(0.9, d - 1)).sum
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 5,
        s"n_common out of range for query ${r.getLong(0)}")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= maxRbo + 1e-9,
        s"rbo out of range for query ${r.getLong(0)}")
    }
    // the self-retrieving queries (both arms rank the source doc #1)
    // must score at least the depth-1 coefficient
    assert(rows.exists(_.getDouble(2) >= 0.0999))
  }
}
