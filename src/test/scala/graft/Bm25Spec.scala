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

  test("posting cap >= every df: pruned search is bit-identical to full") {
    // PostingCap (1024) dwarfs the fixture's dfs, so the default capped
    // ranking and the unpruned baseline must agree row for row — the
    // property that makes small-fixture oracle gates meaningful for
    // the pruned production semantics.
    val q = queries(1L -> "the data", 2L -> "quiet pond", 3L -> "spark data memory")
    val capped = Bm25.search(fixture, "text", q, "query", 5)
      .orderBy("query_id", "rnk").collect().toSeq
    val full = Bm25.searchFromTfFull(Bm25.tfTable(fixture, "text"), q, "query", 5)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(capped == full)
  }

  test("impact pruning keeps the cap highest-impact postings per term; " +
      "idf still uses the full df") {
    import spark.implicits._
    // one shared term over docs of increasing length: impact (tf=1
    // everywhere) is monotone in 1/dl, so a cap of 2 must keep exactly
    // the two SHORTEST docs' postings for "x"
    val docs = Seq(
      (1L, "x a"), (2L, "x a b"), (3L, "x a b c"), (4L, "x a b c e"),
      (5L, "y a")).toDF("doc_id", "text")
    val tf = Bm25.tfTable(docs, "text")
    val kept = Bm25.prunedTf(tf, cap = 2).filter($"term" === "x")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), s"kept $kept")
    // scoring the pruned index: doc 3/4 no longer retrievable for "x",
    // but idf of "x" is computed from the FULL df=4 (pruning truncates
    // lists, it does not re-weight): the kept docs' scores are
    // unchanged vs the full search
    val q = queries(7L -> "x")
    val pruned = Bm25.searchPruned(tf, Bm25.prunedTf(tf, cap = 2), q, "query", 5)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val full = Bm25.searchFromTfFull(tf, q, "query", 5)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(pruned.keySet == Set(1L, 2L))
    assert(pruned == full.filter { case (k, _) => pruned.keySet(k) })
  }

  test("cap agreement on a generated corpus: top-5 overlap vs the full " +
      "ranking stays high at an 8x-pruning cap") {
    import spark.implicits._
    // 400 docs over a 40-term vocabulary with zipf-ish frequencies (the
    // sf fixtures' shape, scaled down); cap=16 prunes head-term lists
    // ~8x. The measured rung values for the shipped cap=1024 are 0.9889
    // at sf10 and 0.9998 at sf1 (SURVEY §7); this pins the MECHANISM at
    // unit scale: aggressive pruning degrades gracefully, never
    // catastrophically, because impact-ordering keeps each term's
    // highest-scoring postings retrievable.
    val docs = (1L to 400L).map { i =>
      val toks = (0 until 12).map { j =>
        val r = (i * 2654435761L + j * 40503L) % 1000
        val t = if (r < 500) r % 8 else if (r < 850) 8 + r % 12 else 20 + r % 20
        s"t$t"
      }
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val tf = Bm25.tfTable(docs, "text")
    val q = queries((1L to 40L).map(i => i -> s"t${(i - 1) % 40}"): _*)
    val full = Bm25.searchFromTfFull(tf, q, "query", 5)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Bm25.searchPruned(tf, Bm25.prunedTf(tf, cap = 16), q, "query", 5)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = full.count(capped).toDouble / full.size
    assert(overlap >= 0.60, f"overlap@5 $overlap%.3f under 8x pruning")
    // and a roomy cap is the identity on the same corpus
    val roomy = Bm25.searchPruned(tf, Bm25.prunedTf(tf, cap = 1 << 20), q, "query", 5)
      .select("query_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(roomy == full)
  }

  test("impact round(x,4) agrees between Spark's BigDecimal HALF_UP and " +
      "the oracle's FP-scaled round over the impact domain (r17 advice)") {
    // Cross-engine risk class (new in r17): the pruned SET's identity
    // hinges on Spark round(x,4) — shortest-decimal BigDecimal,
    // HALF_UP — agreeing with DuckDB round(x,4) — std::round(x·1e4)/1e4
    // — for every impact value; ONE disagreement changes which postings
    // survive the cap (row-level diffs, not score noise). The two
    // semantics DO diverge on adversarial doubles, so first prove this
    // test can see a divergence, then sweep the reachable impact domain.
    def spark4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def duck4(x: Double): Double = {
      val v = x * 1e4
      val f = math.floor(v)
      (if (v - f >= 0.5) f + 1.0 else f) / 1e4 // std::round, x >= 0
    }
    // non-vacuity witness: shortest-decimal says ...75 exactly (HALF_UP
    // rounds up) while the binary value ×1e4 sits below the boundary
    assert(spark4(2.00675) != duck4(2.00675),
      "emulations no longer distinguish the engines — test is vacuous")
    // impact(tf, dl, avgdl) in both engines' exact op order
    def impact(tf: Long, dl: Long, avgdl: Double): Double =
      (tf * (Bm25.K1 + 1.0)) /
        (tf + (Bm25.K1 * ((1.0 - Bm25.B) + ((Bm25.B * dl) / avgdl))))
    // (1) the REAL fixture domain: every (tf, dl) the sf corpus holds,
    // with its exact avgdl — parity here is what the gates rely on
    val tf = Bm25.tfTable(Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")), "text")
    val avgdl = tf.groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(avg(col("dl"))).head().getDouble(0)
    val domain = tf.select("tf", "dl").distinct().collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue()))
    assert(domain.nonEmpty)
    domain.foreach { case (t, d) =>
      val x = impact(t, d, avgdl)
      assert(spark4(x) == duck4(x),
        s"engine round divergence on fixture posting tf=$t dl=$d: $x")
    }
    // (2) an adversarial sweep beyond the fixture: integer tf/dl grids
    // with a deterministic avgdl sweep — any divergence fails loudly,
    // the signal to switch the impact order to integer-scaled compare
    val rnd = new scala.util.Random(97)
    val avgdls = Array.tabulate(200)(_ => 1.0 + rnd.nextDouble() * 299.0) :+ avgdl
    var checked = 0L
    avgdls.foreach { a =>
      var t = 1L
      while (t <= 32) {
        var d = 1L
        while (d <= 128) {
          val x = impact(t, d, a)
          if (spark4(x) != duck4(x))
            fail(s"engine round divergence at tf=$t dl=$d avgdl=$a: impact=$x")
          checked += 1; d += 1
        }
        t += 1
      }
    }
    assert(checked > 800000L)
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
