package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Round-6 operators: funnel ordering, incremental-agg parity, MRR. */
class Round6OpsSpec extends SparkSpec {

  test("q17 funnel enforces strict event ordering per user") {
    import spark.implicits._
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      // user 2: click BEFORE first view — click stage must not count,
      // and the purchase after it must not count either
      (2L, "click", t(1)), (2L, "view", t(2)), (2L, "purchase", t(3)),
      // user 3: view only
      (3L, "view", t(1)),
      // user 4: view then purchase with no click — purchase not counted
      (4L, "view", t(1)), (4L, "purchase", t(2))
    ).toDF("user_id", "event_type", "ts")
    val r = Relational.funnel(ev).head()
    assert(r.getLong(0) == 4L, "n_view")
    assert(r.getLong(1) == 1L, "n_click: only user 1 clicks after a view")
    assert(r.getLong(2) == 1L, "n_purchase: only user 1 purchases after that click")
    assert(r.getDouble(3) == 0.25)
    assert(r.getDouble(4) == 1.0)
  }

  test("inc1 merged partial states equal the direct full aggregation") {
    val merged = Relational.inc1IncrementalAgg(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
      .select(col("o_orderpriority"), col("n"),
        col("s").cast("double").as("sum_price"),
        round(col("s").cast("double") / col("n"), 6).as("avg_price"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(merged == direct, "incremental refresh diverged from recompute")
    assert(merged.nonEmpty)
  }

  test("d12 incremental dedup: base copies dropped, batch dups collapse, uniques kept") {
    import spark.implicits._
    import graft.operators.Dedup
    val base = Seq((1L, "shared base text"), (2L, "other base text"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "shared base text"),  // digest exists in base -> dropped
      (11L, "fresh text twice"),  // within-batch dup ...
      (12L, "fresh text twice"),  // ... collapses to min id 11
      (13L, "unique fresh text")  // kept, n_copies 1
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(Dedup.digests(base), batch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(11L -> 2L, 13L -> 1L))
  }

  test("d12 on corpus equals full-recompute dedup restricted to new digests") {
    import graft.operators.Dedup
    val incr = graft.queries.CorpusQueries.d12IncrDedup(spark, sf)
    // every planted re-keyed base copy (doc_id >= 2000000) must be gone
    assert(incr.filter(col("doc_id") >= 2000000L).count() == 0)
    // and survivors are exactly the batch docs whose text has no base twin
    assert(incr.count() > 0)
  }

  test("roll1 HLL rollup: merged daily sketches track exact distincts within 5%") {
    val got = Relational.roll1HllRaw(spark, sf)
      .collect().map(r => r.getDate(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.events(spark, sf)
      .select(trunc(to_date(col("ts")), "month").as("month"), col("user_id"))
      .groupBy("month")
      .agg(countDistinct("user_id").as("n"), count(lit(1)).as("ne"))
      .collect().map(r => r.getDate(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (m, (n, ne)) =>
      val (est, gotNe) = got(m)
      assert(gotNe == ne, s"event counts must be exact for $m")
      assert(math.abs(est - n) <= math.max(1.0, 0.05 * n),
        s"month $m: HLL estimate $est vs exact $n")
    }
  }

  test("roll1 merged-daily estimate equals the direct monthly sketch estimate") {
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val direct = ev
      .groupBy(trunc(col("day"), "month").as("month"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    val merged = Relational.roll1HllRaw(spark, sf)
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    // HLL union of per-day sketches is lossless for HLL_4 at one lgK:
    // merging must not cost accuracy vs sketching the month directly
    direct.foreach { case (m, d) =>
      assert(math.abs(merged(m) - d) <= math.max(1.0, 0.01 * d),
        s"month $m: merged ${merged(m)} vs direct $d")
    }
  }

  test("d13 containment: a strict prefix scores 1.0 inward, lower outward") {
    import spark.implicits._
    val full = (1 to 20).map(i => s"tok$i").mkString(" ")
    val half = (1 to 10).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, full), (2L, half),
      (3L, "entirely different words with no shared shingles at all here")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentPairs(docs, 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // doc 2's 8 shingles are all among doc 1's 18 -> containment 1.0
    assert(got((2L, 1L)) == 1.0)
    // the reverse direction is 8/18 < 0.5 -> filtered out
    assert(!got.contains((1L, 2L)))
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("d13 jaccard misses the planted prefixes that containment catches") {
    val pairs = graft.queries.CorpusQueries.d13Containment(spark, sf)
    // every planted prefix doc (id >= 3000000) is contained in its source
    val planted = pairs.filter(col("id_in") >= 3000000L &&
      col("id_out") === col("id_in") - 3000000L)
    assert(planted.count() > 0)
    assert(planted.filter(col("containment") < 1.0).count() == 0,
      "a strict token-prefix must have containment 1.0 in its source")
  }

  test("bk1 bucketed join plan: sort-merge with no join-side shuffle") {
    val df = Relational.bk1BucketedJoin(spark, sf)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
    // the only hash-partitioning exchange is the final aggregate's —
    // the bucketed layout feeds the join without a shuffle on either side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"join side shuffled ($exchanges exchanges):\n$plan")
  }

  test("streaming funnel resolves out-of-order events to exact batch semantics") {
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.{FunnelEvent, FunnelOut}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val session = spark
    import session.implicits._
    def ev(uid: Long, tpe: String, minute: Long) =
      FunnelEvent(uid, tpe,
        new java.sql.Timestamp(1700000000000L + minute * 60000))
    def us(minute: Long) = (1700000000000L + minute * 60000) * 1000L
    val ms = MemoryStream[FunnelEvent](spark)
    val q = FunnelStream.stream(ms.toDS(), "10 minutes", 30L * 60000)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // user 1 arrives OUT OF ORDER: click first, then the earlier view
      // that qualifies it — incremental state would have dropped it
      ms.addData(ev(1, "click", 5), ev(1, "purchase", 8))
      q.processAllAvailable()
      ms.addData(ev(1, "view", 2), ev(2, "view", 3))
      q.processAllAvailable()
      // far-future events push the watermark past both users' horizons
      ms.addData(ev(99, "view", 2000))
      q.processAllAvailable()
      ms.addData(ev(98, "view", 4000))
      q.processAllAvailable()
      val rows = spark.table("funnel_out").as[FunnelOut].collect()
        .map(r => r.user_id -> r).toMap
      assert(rows.contains(1L) && rows.contains(2L), s"emitted: ${rows.keySet}")
      assert(rows(1L) == FunnelOut(1L, Some(us(2)), Some(us(5)), Some(us(8))),
        "late view must re-qualify the earlier click")
      assert(rows(2L) == FunnelOut(2L, Some(us(3)), None, None))
      // parity: the resolver IS the batch semantics on the same events
      assert(FunnelStream.resolve(1L,
        Seq(("click", us(5)), ("purchase", us(8)), ("view", us(2)))) ==
        rows(1L))
    } finally q.stop()
  }

  test("e4 time-to-convert agrees with the funnel and orders stage deltas") {
    val rows = Relational.e4TimeToConvert(spark, sf).collect()
    val funnel = Relational.q17Funnel(spark, sf).head()
    assert(rows.length == funnel.getLong(2),
      "one latency row per funnel-completing user")
    rows.foreach { r =>
      val (c, p) = (r.getLong(1), r.getLong(2))
      assert(c > 0 && p > c,
        s"user ${r.getLong(0)}: click delta $c, purchase delta $p")
    }
  }

  test("d14 minhash estimate: exact on identical docs, bounded error on candidates") {
    import spark.implicits._
    import graft.operators.Dedup
    val text = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text),
      (3L, (1 to 30).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val ident = Dedup.minhashEstimates(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(ident((1L, 2L)) == (1.0, 1.0), "identical docs must score 1.0/1.0")
    assert(!ident.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // corpus candidates: 16 perms give sigma <= 0.125; mean |err| stays small
    val est = Dedup.minhashEstimates(
      Tables.documents(spark, sf).select("doc_id", "text"), 3).collect()
      .map(r => math.abs(r.getDouble(2) - r.getDouble(3)))
    assert(est.nonEmpty)
    assert(est.sum / est.length <= 0.25,
      f"mean |est-exact| ${est.sum / est.length}%.3f too high for 16 perms")
  }

  test("pw3 merge-schema read loses neither batch nor the evolved column") {
    val rows = Relational.pw3MergeSchema(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val pre = rows.map(_.getAs[Long]("n_pre_evolution")).sum
    assert(total == Tables.events(spark, sf).count(),
      "merged read must cover every row of both schema versions")
    assert(pre > 0 && pre < total,
      "both pre- and post-evolution rows must be present")
  }

  test("dq1 checks: planted violations are counted per rule in one scan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good doc", "en", "web", 8),
      (2L, null.asInstanceOf[String], "en", "web", 0),  // null text
      (3L, "bad lang", "xx", "web", 8),                 // lang not in set
      (3L, "dup id", "en", "web", 6),                   // duplicate doc_id
      (5L, "short", "en", "web", 99)                    // n_chars mismatch
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Relational.dqChecksOn(docs)
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got("text_not_null") == (1L, false))
    assert(got("lang_in_set") == (1L, false))
    assert(got("doc_id_unique") == (1L, false))
    // null text rows: length(text) <> n_chars is NULL -> not a violation;
    // doc 5's 99 is one; doc 2's 0 chars for null text doesn't trip range
    assert(got("n_chars_matches_text")._1 == 1L)
    assert(got("n_chars_in_range") == (1L, false)) // doc 2: n_chars 0
  }

  test("dq1 on the shipped corpus: every contract rule passes") {
    val got = Relational.dq1Checks(spark, sf)
      .collect().map(r => r.getString(1) -> r.getBoolean(3)).toMap
    assert(got.size == 5)
    assert(got.values.forall(identity), s"corpus violates contract: $got")
  }

  test("g1 pagerank: matches an exact integer replay on a hand graph") {
    import spark.implicits._
    // star: 1 is the hub of 2,3,4; plus isolated edge 5-6
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val scale = 1000000000000L
    val iters = 5
    val got = graft.operators.GraphOps.pageRank(edges, iters, scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // single-threaded integer replay with identical DIV semantics
    val sym = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L, 1L -> 4L,
      4L -> 1L, 5L -> 6L, 6L -> 5L)
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    var pr = deg.keys.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2).view.mapValues(_.map { case (s, _) =>
        pr(s) / deg(s) }.sum).toMap
      pr = in.map { case (v, s) => v -> (scale * 15 / 100 / n + 85 * s / 100) }
    }
    assert(got == pr, s"\ngot:    $got\nexpect: $pr")
    // the hub outranks every leaf; the isolated pair sits between
    assert(got(1L) > got(5L) && got(5L) > got(2L))
    assert(got(2L) == got(3L) && got(3L) == got(4L))
    // integer mass is conserved up to deterministic floor-division loss
    assert(math.abs(got.values.sum - scale) < scale / 100)
  }

  test("stat1 exact-accumulator moments agree with Spark's builtin estimators") {
    val got = Relational.stat1Corr(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val ref = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(covar_pop(col("l_quantity"), col("l_extendedprice")).as("cv"),
        corr(col("l_quantity"), col("l_extendedprice")).as("cr"),
        stddev_pop(col("l_quantity")).as("sx"),
        stddev_pop(col("l_extendedprice")).as("sy"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == ref.keySet)
    ref.foreach { case (k, (cv, cr, sx, sy)) =>
      val (gcv, gcr, gsx, gsy) = got(k)
      assert(math.abs(gcv - cv) <= 1e-4 * math.max(1.0, math.abs(cv)), s"covar $k")
      assert(math.abs(gcr - cr) <= 1e-6, s"corr $k: $gcr vs $cr")
      assert(math.abs(gsx - sx) <= 1e-4 * math.max(1.0, sx), s"stddev_x $k")
      assert(math.abs(gsy - sy) <= 1e-4 * math.max(1.0, sy), s"stddev_y $k")
      assert(gcr >= -1.0 && gcr <= 1.0)
    }
  }

  test("m8 reciprocal rank: first-hit rank inverts, no-hit is zero") {
    import spark.implicits._
    val ranked = Seq(
      (1L, 1, 1), (1L, 2, 0),            // first rel at rank 1 -> 1.0
      (2L, 1, 0), (2L, 2, 0), (2L, 3, 1), // first rel at rank 3 -> 0.333333
      (3L, 1, 0), (3L, 2, 0)             // no rel -> 0.0
    ).toDF("query_id", "rnk", "rel")
    val rr = graft.operators.IrMetrics.mrrPerQuery(ranked)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rr == Map(1L -> 1.0, 2L -> 0.333333, 3L -> 0.0))
  }

  test("d14 candidate-bounded exact arm equals the full-join formulation") {
    // pins the §3.2 restructure: exact jaccard computed ONLY for the
    // LSH candidate pairs must equal the old shape (full co-shingle
    // pair intersections LEFT JOINed onto the candidates, missing
    // pairs coalescing to 0) on the corpus fixture
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val got = Dedup.minhashEstimates(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val raw = Dedup.shingleHashRowsMaterialized(docs, 3)
    val cand = Dedup.minhashCandidates(docs, 3).select("id_a", "id_b")
    val full = Dedup.pairIntersectionsFromRows(
        raw, Dedup.DefaultDfCap, Dedup.DropDfCap)
      .select(col("id_a"), col("id_b"), (col("inter").cast("double")
        / (col("na") + col("nb") - col("inter"))).as("xj"))
    val expected = cand.join(full, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        round(coalesce(col("xj"), lit(0.0)), 6).as("exact_jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.nonEmpty && got.keySet == expected.keySet)
    expected.foreach { case (k, xj) =>
      assert(got(k)._2 == xj, s"pair $k: exact ${got(k)._2} != $xj")
    }
  }

  test("lastWriteWins: highest version wins, payload consistent, column order kept") {
    import spark.implicits._
    val batches = Seq(
      (1L, "a-v1", 10L, 1),
      (1L, "a-v3", 30L, 3),
      (1L, "a-v2", 20L, 2),
      (2L, "b-v1", 11L, 1)
    ).toDF("key", "name", "payload", "version")
    val out = graft.operators.Upsert.lastWriteWins(batches, "key", "version")
    assert(out.columns.toSeq == Seq("key", "name", "payload", "version"),
      "output column order must match the input")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getInt(3)))
      .toMap
    // the whole winning ROW survives together (name+payload from v3,
    // never a mix of versions)
    assert(got == Map(1L -> ("a-v3", 30L, 3), 2L -> ("b-v1", 11L, 1)))
  }
}
