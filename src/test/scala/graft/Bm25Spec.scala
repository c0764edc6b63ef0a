package graft

import graft.operators.Bm25
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "spark caches hot data in memory"),
      (3L, "ducks swim on the quiet pond"),
      (4L, "the pond reflects the quiet sky"),
      (5L, "distributed joins shuffle data by key")
    ).toDF("doc_id", "text")
  }

  private def queries(qs: (Long, String)*) = {
    import spark.implicits._
    qs.toDF("query_id", "query")
  }

  test("rare exact term outranks docs without it") {
    val res = Bm25.search(fixture, "text", queries(100L -> "pond"), "query", 3)
      .orderBy("rnk").collect()
    // only docs 3 and 4 contain "pond"
    assert(res.length == 2)
    assert(res.map(_.getLong(1)).toSet == Set(3L, 4L))
    assert(res.forall(_.getDouble(2) > 0.0))
  }

  test("idf downweights ubiquitous terms relative to rare ones") {
    // "data" appears in 3 docs, "cluster" in 1: for the combined query,
    // doc 1 (has both) must beat docs that only have "data"
    val res = Bm25.search(fixture, "text", queries(7L -> "data cluster"),
      "query", 5).collect()
    val top = res.filter(_.getInt(3) == 1).head
    assert(top.getLong(1) == 1L)
    assert(res.length == 3) // docs 1, 2, 5 have "data"; only 1 has "cluster"
  }

  test("scores follow the BM25 formula on a hand-computed case") {
    // single-term query "pond": df=2, N=5, idf = ln(1 + (5-2+0.5)/(2.5))
    // every fixture doc has 6 tokens, so dl/avgdl = 1 for docs 3 and 4
    val idf = math.log(1.0 + (5.0 - 2.0 + 0.5) / 2.5)
    val expected = BigDecimal(
      idf * (1.0 * (Bm25.K1 + 1.0))
        / (1.0 + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * 6.0 / 6.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val res = Bm25.search(fixture, "text", queries(9L -> "pond"), "query", 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(math.abs(res(3L) - expected) < 1e-9, s"got ${res(3L)}, want $expected")
    assert(math.abs(res(4L) - expected) < 1e-9)
  }

  test("k bounds results per query and ranks are dense from 1") {
    val res = Bm25.search(fixture, "text",
      queries(1L -> "the data", 2L -> "quiet pond"), "query", 2).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 2))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length))
    }
  }
}
