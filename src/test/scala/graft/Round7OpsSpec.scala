package graft

import graft.queries.{CorpusQueries, MetricQueries, Relational, VectorQueries}
import org.apache.spark.sql.functions._

/** Round-7 operator invariants: tolerance as-of (a3), partition
  * fingerprints (fp2), langid confusion (t10), exact global
  * percentiles (m11), Matryoshka truncation recall (v21), per-dim
  * embedding stats (emb1).
  */
class Round7OpsSpec extends SparkSpec {

  test("a3: every match within tolerance and a subset of the plain as-of") {
    val a3 = Relational.a3AsofTolerance(spark, sf).cache()
    assert(a3.filter(col("gap_ms") < 0 || col("gap_ms") > 600000).count() == 0)
    // dropping the tolerance column, a3 rows ⊆ a1 rows (same latest-click
    // semantics, only the stale matches removed)
    val a1 = Relational.a1Asof(spark, sf).select("event_id", "click_id")
    assert(a3.select("event_id", "click_id").exceptAll(a1).count() == 0)
  }

  test("fp2: partition fingerprints are order-independent and conserve rows") {
    val base = Relational.fp2PartitionFingerprint(spark, sf)
      .orderBy("day").collect()
    val evCount = Tables.events(spark, sf).count()
    assert(base.map(_.getLong(1)).sum == evCount, "per-day counts conserve rows")
    // recompute over a reshuffled input: XOR folds must not care
    val again = Relational.fp2PartitionFingerprint(spark, sf)
      .repartition(7).orderBy("day").collect()
    assert(base.sameElements(again))
  }

  test("t10: per-lang shares sum to 1 and docs are conserved") {
    val conf = CorpusQueries.t10LangidEval(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(conf.agg(sum("n_docs")).head.getLong(0) == nDocs)
    val shares = conf.groupBy("lang").agg(round(sum("share"), 3).as("s"))
    assert(shares.filter(abs(col("s") - 1.0) > 0.01).count() == 0)
  }

  test("m11: exact global percentiles equal a driver-side sort") {
    val m11 = MetricQueries.m11GlobalPcts(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val vals = Tables.events(spark, sf).select("value")
      .collect().map(_.getDouble(0)).sorted
    def interp(q: Double): Double = {
      val pos = (vals.length - 1).toDouble * q
      val lo = math.floor(pos).toInt
      val frac = pos - lo
      val v = if (frac == 0.0) vals(lo) else vals(lo) + (vals(lo + 1) - vals(lo)) * frac
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(m11("p50") == interp(0.50) && m11("p95") == interp(0.95)
      && m11("p99") == interp(0.99))
    assert(m11("p50") <= m11("p95") && m11("p95") <= m11("p99"))
  }

  test("v21: truncated-dim recall is a valid fraction and beats chance") {
    val v21 = VectorQueries.v21Matryoshka(spark, sf).cache()
    assert(v21.filter(col("recall") < 0 || col("recall") > 1).count() == 0)
    assert(v21.filter(col("n_overlap") > VectorQueries.K).count() == 0)
    // 16 of 64 dims should retrieve far better than random top-5
    val mean = v21.agg(avg("recall")).head.getDouble(0)
    assert(mean > 0.05, s"mean truncated recall $mean suspiciously low")
  }

  test("emb1: per-dim stats are conserved and internally consistent") {
    val stats = VectorQueries.emb1DimStats(spark, sf).cache()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(stats.count() == VectorQueries.EmbedDim)
    assert(stats.filter(col("n") =!= nVecs).count() == 0)
    // quantization error of the mean is bounded by the 1e-6 grid (plus
    // the 6dp output rounding on both sides)
    assert(stats.filter(col("mean_v") < col("min_v") - 1e-5
      || col("mean_v") > col("max_v") + 1e-5).count() == 0)
    assert(stats.filter(col("var_v") < -1e-9).count() == 0)
  }

  test("runningTotal handles negative values (non-monotone local prefix)") {
    // ±1 sweep deltas: the per-partition running sum is non-monotone, so
    // the cross-partition shift must use the partition SUM, not the max
    // of the local running total (the regression ov1 exposed)
    import spark.implicits._
    val n = 1000
    val rows = (0 until n).map(i => (i, if (i % 2 == 0) 1L else -1L)).toDF("k", "v")
    val run = Dist.runningTotal(rows, Seq(col("k").asc), "v")
      .orderBy("k").select("v_end").as[Long].collect()
    val expect = (0 until n).scanLeft(0L)((acc, i) =>
      acc + (if (i % 2 == 0) 1L else -1L)).tail
    assert(run.toSeq == expect.toSeq)
  }

  test("ov1: peak concurrency equals a per-type window baseline") {
    val ov1 = Relational.ov1PeakConcurrency(spark, sf).cache()
    // baseline: same endpoint deltas through a plain per-type window
    val ev = Tables.events(spark, sf).select(col("event_type"), col("ts"))
    val pts = ev.select(col("event_type"), col("ts").as("t"), lit(1L).as("d"))
      .unionAll(ev.select(col("event_type"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("t"), lit(-1L).as("d")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      .orderBy(col("t").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val base = pts.groupBy("event_type", "t").agg(sum("d").as("d"))
      .withColumn("conc", sum("d").over(w))
      .groupBy("event_type").agg(max("conc").as("peak"))
    val joined = ov1.join(base, "event_type")
    assert(joined.filter(col("peak_concurrency") =!= col("peak")).count() == 0)
    assert(ov1.filter(col("peak_concurrency") < 1).count() == 0)
  }

  test("tok1: fertility is consistent with exact char/token sums") {
    val t = queries.CorpusQueries.tok1Fertility(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(t.agg(sum("n_docs")).head.getLong(0) == nDocs)
    // chars-per-token must be ≥ 1 (every token has ≥1 char) and equal
    // the quotient of the two exact sums
    assert(t.filter(col("chars_per_token") < 1.0).count() == 0)
    assert(t.filter(abs(col("chars_per_token")
      - round(col("n_chars").cast("double") / col("n_tokens").cast("double"), 6))
      > 0).count() == 0)
  }

  test("mm5: per-lang size percentiles are ordered and bracketed") {
    val m = queries.IngestQueries.mm5SizePcts(spark, sf).cache()
    assert(m.filter(col("p50") > col("p95") || col("p95") > col("p99")).count() == 0)
    // percentiles live inside the per-lang min/max size envelope
    val env = operators.MultiModal.mediaTable(Tables.documents(spark, sf))
      .select(col("lang"), length(col("media")).cast("long").as("nb"))
      .groupBy("lang").agg(min("nb").as("lo"), max("nb").as("hi"))
    val j = m.join(env, "lang")
    assert(j.filter(col("p50") < col("lo") || col("p99") > col("hi")).count() == 0)
  }

  test("d16: observed LSH candidate rate is monotone-ish and bounded") {
    val d = queries.CorpusQueries.d16LshCurve(spark, sf).cache()
    assert(d.filter(col("observed_rate") < 0 || col("observed_rate") > 1).count() == 0)
    assert(d.filter(col("theory_rate") < 0 || col("theory_rate") > 1).count() == 0)
    assert(d.filter(col("n_candidates") > col("n_pairs")).count() == 0)
  }

  test("iv1: bucketed interval join equals the direct theta join") {
    val iv1 = Relational.iv1IntervalJoin(spark, sf)
    // brute-force baseline: the theta join iv1's bucketing avoids
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      col("event_type"), unix_millis(col("ts")).as("st"))
      .withColumn("en", col("st") + 300000L)
    val a = ev.select(col("user_id"), col("event_id").as("ia"),
      col("event_type").as("ta"), col("st").as("sa"), col("en").as("ea"))
    val b = ev.select(col("user_id"), col("event_id").as("ib"),
      col("event_type").as("tb"), col("st").as("sb"), col("en").as("eb"))
    val brute = a.join(b, "user_id")
      .filter(col("ia") < col("ib") && col("ta") =!= col("tb")
        && col("sa") < col("eb") && col("sb") < col("ea"))
      .groupBy(least(col("ta"), col("tb")).as("type_a"),
        greatest(col("ta"), col("tb")).as("type_b"))
      .agg(count(lit(1)).as("n_brute"))
    val j = iv1.join(brute, Seq("type_a", "type_b"), "full")
    assert(j.filter(col("n_overlaps").isNull || col("n_brute").isNull
      || col("n_overlaps") =!= col("n_brute")).count() == 0)
  }

  test("bl1: Benford digit shares sum to ~1 and cover digits 1-9") {
    val b = Relational.bl1Benford(spark, sf).cache()
    assert(b.count() <= 9)
    assert(b.filter(!col("digit").isin((1 to 9).map(_.toString): _*)).count() == 0)
    val obs = b.agg(sum("observed_share")).head.getDouble(0)
    assert(math.abs(obs - 1.0) < 1e-4, s"observed shares sum to $obs")
    val exp = b.agg(sum("expected_share")).head.getDouble(0)
    assert(exp <= 1.0 + 1e-9)
  }

  test("ppl2: bigram NLL bounded below by ln-of-denominator floor and finite") {
    val p = queries.CorpusQueries.ppl2BigramNll(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf)
      .filter(size(operators.Embed.tokens(col("text"))) >= 2).count()
    assert(p.count() == nDocs)
    // add-one smoothing keeps every probability in (0, 1] → NLL ≥ 0
    assert(p.filter(col("avg_nll") < 0).count() == 0)
    assert(p.filter(col("n_bigrams") < 1).count() == 0)
  }

  test("gs1: grouping-set granularities are mutually consistent") {
    val g = Relational.gs1GroupingSets(spark, sf).cache()
    // the grand total row equals the sum of the (region) rows
    val grand = g.filter(col("g_region") === 1 && col("g_nation") === 1)
      .agg(sum("n_orders")).head.getLong(0)
    val byRegion = g.filter(col("g_region") === 0 && col("g_nation") === 1)
      .agg(sum("n_orders")).head.getLong(0)
    val byPair = g.filter(col("g_region") === 0 && col("g_nation") === 0)
      .agg(sum("n_orders")).head.getLong(0)
    assert(grand == byRegion && grand == byPair)
  }

  test("ed1: deletion-neighborhood join equals the quadratic baseline") {
    import spark.implicits._
    val ed1 = Relational.ed1EditDistanceJoin(spark, sf)
    val words = Tables.part(spark, sf)
      .select(explode(split(col("p_name"), " ")).as("w")).distinct()
      .as[String].collect()
    val brute = (for {
      a <- words; b <- words if a < b
      d = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b).toInt if d <= 1
    } yield (a, b, d)).toSet
    val got = ed1.collect().map(r => (r.getString(0), r.getString(1),
      r.getInt(2))).toSet
    assert(got == brute, s"got=$got brute=$brute")
  }

  test("udc1: capped sum never exceeds n_users x cap and counts whales") {
    val u = Relational.udc1UserCappedAgg(spark, sf).cache()
    assert(u.filter(col("capped_sum") > col("n_users") * 100.0).count() == 0)
    assert(u.filter(col("n_capped") > col("n_users")).count() == 0)
    // capping can only lower the total vs the raw sum
    val raw = Tables.events(spark, sf).groupBy("event_type")
      .agg(round(sum(col("value").cast("decimal(18,2)")), 2)
        .cast("double").as("raw_sum"))
    assert(u.join(raw, "event_type")
      .filter(col("capped_sum") > col("raw_sum") + 0.001).count() == 0)
  }

  test("pmi1: collocation PMI respects min count and symmetric formula") {
    val p = queries.CorpusQueries.pmi1Collocations(spark, sf).cache()
    assert(p.filter(col("c12") < 5).count() == 0)
    // PMI of an adjacent bigram with add-nothing counts is finite
    assert(p.filter(col("pmi").isNull).count() == 0)
  }

  test("kg1: knn graph has <= k neighbors per node, ranked by score") {
    val g = VectorQueries.kg1KnnGraph(spark, sf).cache()
    val byCnt = g.groupBy("src").agg(count(lit(1)).as("deg"),
      max("rnk").as("mx"))
    assert(byCnt.filter(col("deg") > VectorQueries.KnnGraphK).count() == 0)
    assert(byCnt.filter(col("deg") =!= col("mx")).count() == 0)
    // symmetric construction: if (a,b) scored, b appears as a source
    assert(g.select("dst").distinct().join(g.select("src").distinct(),
      col("dst") === col("src"), "left_anti").count() == 0)
    // no self edges
    assert(g.filter(col("src") === col("dst")).count() == 0)
  }

  test("kg1: heap-dedup score-in-stage shape equals distinct-then-rescore") {
    // the r16 shape (scoredEdgesLshRp + distinct top-k heap) must be
    // row-identical to the former pipeline: distinct candidate pairs,
    // one rescore per pair, mirror, row_number window
    val w = VectorQueries.pairWeightsFor(spark, sf)
    val pairs = operators.VectorSearch.nearDupPairsLshRp(
      Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding").as("v")), -1.0, w)
    val directed = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("score"))
      .unionAll(pairs
        .select(col("id_b").as("src"), col("id_a").as("dst"), col("score")))
    val win = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(col("score").desc, col("dst").asc)
    val legacy = directed.withColumn("rnk", row_number().over(win))
      .filter(col("rnk") <= VectorQueries.KnnGraphK)
      .select("src", "dst", "score", "rnk")
    val current = VectorQueries.kg1KnnGraph(spark, sf)
    assert(current.unionAll(legacy).distinct().count() == legacy.count(),
      "row sets differ")
    assert(current.count() == legacy.count())
  }

  test("kcorePeel: K4 clique survives every peel, star dissolves") {
    import spark.implicits._
    // K4 (nodes 1-4) + a star centered at 10 with leaves 11..15
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val star = (11L to 15L).map(l => (10L, l))
    val edges = (k4 ++ star).toDF("id_a", "id_b")
    val out = operators.GraphOps.kcorePeel(edges, 2, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    (1L to 4L).foreach { n => assert(out(n) == ((3L, 1)), s"clique node $n") }
    // leaves die in peel 1 (deg 1); the hub's edges vanish with them,
    // so it dies in peel 2 having survived one round
    (11L to 15L).foreach { n => assert(out(n) == ((0L, 0)), s"leaf $n") }
    assert(out(10L) == ((1L, 0)), "star hub survives exactly one peel")
  }

  test("tv1: total variation is in [0,1] and equals a driver recompute") {
    val t = queries.CorpusQueries.tv1SourceShift(spark, sf).head()
    val tv = t.getAs[Double]("tv_distance")
    assert(tv >= 0.0 && tv <= 1.0)
    val per = Tables.documents(spark, sf).groupBy("source").agg(
      sum((col("doc_id") % 2 === 0).cast("long")).as("ca"),
      sum((col("doc_id") % 2 === 1).cast("long")).as("cb"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val ta = per.map(_._1).sum; val tb = per.map(_._2).sum
    val num = per.map { case (ca, cb) => math.abs(ca * tb - cb * ta) }.sum
    val expect = BigDecimal(num.toDouble / (2.0 * ta * tb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(tv == expect)
  }

  test("cmp1: repetitive text compresses far below high-entropy text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam " * 400),                                  // one token repeated
      (2L, (1 to 400).map(i => s"w${i * 7919 % 9973}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.compressionRatio(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("ratio")).toMap
    assert(out(1L) < 0.05, s"repetitive ratio ${out(1L)}")
    assert(out(2L) > 0.2, s"high-entropy ratio ${out(2L)}")
    assert(out.values.forall(r => r > 0.0 && r < 1.5))
  }

  test("dft1: split sizes conserve vectors and drift matches the means") {
    val dft = VectorQueries.dft1EmbeddingDrift(spark, sf).cache()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(dft.count() == VectorQueries.EmbedDim)
    assert(dft.filter(col("na") + col("nb") =!= nVecs).count() == 0)
    // drift ≈ mean_b − mean_a within the two roundings' slack
    assert(dft.filter(abs(col("drift") - (col("mean_b") - col("mean_a")))
      > 2e-6).count() == 0)
  }

  test("e6: gap percentiles are ordered, non-negative, and counted") {
    val e6 = Relational.e6Interarrival(spark, sf).cache()
    assert(e6.filter(col("p50") < 0).count() == 0)
    assert(e6.filter(col("p50") > col("p95") || col("p95") > col("p99"))
      .count() == 0)
    val evPerType = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n_ev"))
    // gaps = events − (types × days with ≥1 event): bounded above
    assert(e6.join(evPerType, "event_type")
      .filter(col("n_gaps") >= col("n_ev")).count() == 0)
  }

  test("nb1: confusion matrix conserves docs and beats the prior baseline") {
    val conf = queries.CorpusQueries.nb1NaiveBayes(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(conf.agg(sum("n_docs")).head.getLong(0) == nDocs)
    // trained-on-self NB must beat always-predict-majority-lang
    val correct = conf.filter(col("lang") === col("pred_lang"))
      .agg(sum("n_docs")).head.getLong(0)
    val majority = Tables.documents(spark, sf).groupBy("lang").count()
      .agg(max("count")).head.getLong(0)
    assert(correct >= majority,
      s"NB accuracy $correct/$nDocs below majority baseline $majority")
  }

  test("ml1: per-label accuracy is a valid fraction over all vectors") {
    val m = VectorQueries.ml1KnnClassify(spark, sf).cache()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(m.agg(sum("n_vecs")).head.getLong(0) == nVecs,
      "every vector gets a prediction (kg1 covers all nodes)")
    assert(m.filter(col("n_correct") > col("n_vecs")).count() == 0)
    assert(m.filter(col("accuracy") < 0 || col("accuracy") > 1).count() == 0)
  }

  test("reg1: OLS matches a driver-side double fit within rounding") {
    val r = Relational.reg1Trend(spark, sf).head()
    val daily = Tables.orders(spark, sf)
      .select(expr("datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01')")
        .cast("long").as("d"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("d").agg(sum("c").as("c"))
      .collect().map(row => (row.getLong(0).toDouble, row.getLong(1).toDouble / 100.0))
    val n = daily.length.toDouble
    val sx = daily.map(_._1).sum; val sy = daily.map(_._2).sum
    val sxx = daily.map(p => p._1 * p._1).sum
    val sxy = daily.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(math.abs(r.getAs[Double]("slope_dollars_per_day") - slope) < 1e-3)
    assert(math.abs(r.getAs[Double]("intercept_dollars") - icept) < 1e-2)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
  }

  test("mk1: markov accuracy >= uniform chance and conserves transitions") {
    val m = Relational.mk1MarkovEval(spark, sf).cache()
    val totalTrans = Relational.seq2Transitions(spark, sf)
      .agg(sum("n")).head.getLong(0)
    assert(m.agg(sum("n_transitions")).head.getLong(0) == totalTrans)
    assert(m.filter(col("n_correct") > col("n_transitions")).count() == 0)
    // argmax of a 5-type row can't be below 1/5 of its row mass
    assert(m.filter(col("accuracy") < 0.2 - 1e-9).count() == 0)
  }

  test("anon1: risky classes are counted against the full class count") {
    val a = Relational.anon1KAnonymity(spark, sf).cache()
    assert(a.filter(col("n_risky") > col("n_classes")).count() == 0)
    assert(a.filter(col("min_class_size") < 1).count() == 0)
    assert(a.filter(col("risky_share") < 0 || col("risky_share") > 1).count() == 0)
  }

  test("late1: lateness is non-negative with ordered percentiles") {
    val l = Relational.late1Lateness(spark, sf).cache()
    assert(l.filter(col("p50") < 0).count() == 0)
    assert(l.filter(col("p50") > col("p95") || col("p95") > col("p99")).count() == 0)
    val nEv = Tables.events(spark, sf).count()
    assert(l.agg(sum("n_events")).head.getLong(0) == nEv,
      "every event gets a lateness value (first-of-day is 0)")
  }

  test("qe1: expansion terms exclude query terms, <=2 per query") {
    val q = queries.CorpusQueries.qe1Prf(spark, sf).cache()
    assert(q.groupBy("query_id").count()
      .filter(col("count") > 2).count() == 0)
    // no expansion term may be one of the query's own terms
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val qt = operators.TextAnalysis.queryGen(docs, "text")
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(operators.Embed.tokens(col("query")))).as("term"))
    assert(q.join(qt, Seq("query_id", "term")).count() == 0)
    assert(q.filter(col("fb_tf") < 1).count() == 0)
  }

  test("cd1: cluster histogram is consistent with the component table") {
    val cd = queries.CorpusQueries.cd1ClusterProfile(spark, sf).cache()
    val comp = queries.CorpusQueries.d8DedupGroups(spark, sf)
    assert(cd.agg(sum("n_docs")).head.getLong(0) == comp.count())
    assert(cd.filter(col("n_docs")
      =!= col("group_size") * col("n_components")).count() == 0,
      "docs per size bucket == size x components")
    assert(cd.filter(col("group_size") < 2).count() == 0,
      "singletons are not components")
  }

  test("fh1: collision report conserves tf mass and bounds buckets") {
    val f = queries.CorpusQueries.fh1HashCollisions(spark, sf).cache()
    assert(f.filter(col("bucket") < 0
      || col("bucket") >= VectorQueries.EmbedDim).count() == 0)
    val totalTf = Tables.documents(spark, sf)
      .select(explode(operators.Embed.tokens(col("text"))).as("t")).count()
    assert(f.agg(sum("tf_mass")).head.getLong(0) == totalTf)
    assert(f.filter(col("collided") === 1 && col("n_tokens") < 2).count() == 0)
  }

  test("sz1: hour-of-week shares sum to 1 over valid (dow, hr) cells") {
    val z = Relational.sz1Seasonality(spark, sf).cache()
    assert(z.filter(col("dow") < 0 || col("dow") > 6
      || col("hr") < 0 || col("hr") > 23).count() == 0)
    val s = z.agg(round(sum("share"), 3)).head.getDouble(0)
    assert(math.abs(s - 1.0) < 0.01, s"shares sum to $s")
    assert(z.agg(sum("n_events")).head.getLong(0)
      == Tables.events(spark, sf).count())
  }

  test("lj1: lateral top-1 equals the window top-1 per customer") {
    val l = Relational.lj1LateralTopk(spark, sf).cache()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val base = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("exp_order"))
    val j = l.join(base, col("c_custkey") === col("o_custkey"), "full")
    assert(j.filter(col("o_orderkey").isNull || col("exp_order").isNull
      || col("o_orderkey") =!= col("exp_order")).count() == 0)
  }

  test("ab2: CUPED reduces (or matches) raw variance proxies and bounds rho2") {
    val r = Relational.ab2Cuped(spark, sf).head()
    val rho2 = r.getAs[Double]("rho2")
    assert(rho2 >= 0.0 && rho2 <= 1.0 + 1e-9)
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    // with theta from the pooled fit, the adjustment is a real number
    // and diff_cuped = diff_raw - theta * pre-period diff (recompute)
    val theta = r.getAs[Double]("theta")
    assert(!theta.isNaN && !r.getAs[Double]("diff_cuped").isNaN)
  }

  test("ret1: return counts bounded by active users and by later activity") {
    val ret = Relational.ret1D7Return(spark, sf).cache()
    assert(ret.filter(col("n_returned") > col("n_active")).count() == 0)
    assert(ret.filter(col("return_rate") < 0 || col("return_rate") > 1).count() == 0)
    // the last active day can have no returns (no later days exist)
    val lastDay = ret.agg(max("day")).head.getLong(0)
    assert(ret.filter(col("day") === lastDay)
      .head.getAs[Long]("n_returned") == 0)
  }

  test("ix2: bucket stats conserve vectors and predict d6's join volume") {
    val x = VectorQueries.ix2LshStats(spark, sf).cache()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(x.count() == VectorQueries.RpTables)
    assert(x.filter(col("n_vectors") =!= nVecs).count() == 0)
    assert(x.filter(col("max_pop") > col("n_vectors")).count() == 0)
    // predicted pair volume: recompute one table's Σ c(c−1)/2 directly
    val pops = operators.VectorSearch
      .hyperplaneBuckets(col("embedding"), VectorQueries.rpWeightsPair)
    val t0 = Tables.embeddings(spark, sf)
      .select(posexplode(pops).as(Seq("tbl", "bucket")))
      .filter(col("tbl") === 0)
      .groupBy("bucket").count()
      .agg(sum(col("count") * (col("count") - 1))).head.getLong(0) / 2
    assert(x.filter(col("tbl") === 0).head.getAs[Long]("cand_pairs") == t0)
  }

  test("pq3: distortion is consistent with the encode's own distances") {
    val p = VectorQueries.pq3Distortion(spark, sf).cache()
    assert(p.count() == operators.Pq.NumSubspaces)
    assert(p.filter(col("mean_err") < 0 || col("max_err") < col("mean_err"))
      .count() == 0)
    // n per subspace == corpus size
    val n = VectorQueries.corpusVecs(spark, sf).count()
    assert(p.filter(col("n") =!= n).count() == 0)
  }

  test("ohlc1: high/low bracket open/close, counts conserve events") {
    val o = Relational.ohlc1Bars(spark, sf).cache()
    assert(o.filter(col("open") > col("high") || col("open") < col("low")
      || col("close") > col("high") || col("close") < col("low")).count() == 0)
    assert(o.agg(sum("n_events")).head.getLong(0)
      == Tables.events(spark, sf).count())
    // single-event days must have open == close == high == low
    assert(o.filter(col("n_events") === 1 &&
      (col("open") =!= col("close") || col("high") =!= col("low"))).count() == 0)
  }

  test("pp1: footer-stats aggregate equals the full-scan aggregate") {
    val r = Relational.pp1PushdownMinmax(spark, sf).head()
    val full = Tables.lineitem(spark, sf).agg(count(lit(1)),
      min("l_extendedprice"), max("l_extendedprice")).head()
    assert(r.getAs[Long]("n_rows") == full.getLong(0))
    assert(r.getAs[Double]("min_price") == full.getDouble(1))
    assert(r.getAs[Double]("max_price") == full.getDouble(2))
  }

  test("ses1: session-duration percentiles are ordered and counted") {
    val r = Relational.ses1SessionPcts(spark, sf).head()
    assert(r.getAs[Long]("n_sessions")
      == Relational.e2Sessions(spark, sf).count())
    val (p50, p95, p99) = (r.getAs[Double]("p50"),
      r.getAs[Double]("p95"), r.getAs[Double]("p99"))
    assert(p50 >= 0 && p50 <= p95 && p95 <= p99)
  }

  test("emh1: cosine bands cover [-1,1], shares sum to 1, pairs = N-1") {
    val h = VectorQueries.emh1SimHistogram(spark, sf).cache()
    assert(h.filter(col("band") < 0 || col("band") > 10).count() == 0)
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(h.agg(sum("n_pairs")).head.getLong(0) == nVecs - 1)
    val s = h.agg(round(sum("share"), 3)).head.getDouble(0)
    assert(math.abs(s - 1.0) < 0.01)
  }

  test("ent1: entropy bounded by ln(n_distinct), non-negative") {
    val e = queries.CorpusQueries.ent1ColumnEntropy(spark, sf).cache()
    assert(e.count() == 3)
    // 0 ≤ H ≤ ln(k); quantization slack one millinats-grid step
    assert(e.filter(col("entropy_nats") < -1e-6).count() == 0)
    assert(e.filter(col("entropy_nats")
      > log(col("n_distinct").cast("double")) + 1e-5).count() == 0)
  }

  test("mi1: MI is non-negative and bounded by both marginal entropies") {
    val r = queries.CorpusQueries.mi1MutualInfo(spark, sf).head()
    val mi = r.getAs[Double]("mi_nats")
    // quantization slack: each ln term floors to the millinats grid
    assert(mi >= -1e-5, s"MI $mi negative beyond grid slack")
    assert(mi <= r.getAs[Double]("h_lang") + 1e-5)
    assert(mi <= r.getAs[Double]("h_source") + 1e-5)
  }

  test("js2: typed parse flags malformed JSON as null structs") {
    import spark.implicits._
    val rows = Seq("""{"k": 7}""", """{"k": 13}""", "not json at all", "")
      .toDF("props")
    val parsed = rows.select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).as("p"))
      .select(col("p.k").as("k"), col("p.k").isNull.cast("long").as("bad"))
    assert(parsed.agg(sum("bad")).head.getLong(0) == 2)
    assert(parsed.filter(col("k").isNotNull).count() == 2)
    // and on the clean fixture the query reports zero malformed
    val q = Relational.js2TypedJson(spark, sf)
    assert(q.agg(sum("n_malformed")).head.getLong(0) == 0)
  }

  test("ta1: typed Aggregator equals the untyped decimal groupBy") {
    val t = Relational.ta1TypedAggregator(spark, sf)
    val base = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(round(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("double") / 100.0, 2).as("revenue2"),
        count(lit(1)).as("n2"))
    val j = t.join(base, "priority")
    assert(j.filter(col("revenue") =!= col("revenue2")
      || col("n_orders") =!= col("n2")).count() == 0)
    assert(t.count() == base.count())
  }

  test("slo1: burn rate consistent with its own window counts") {
    val s1 = Relational.slo1BurnRate(spark, sf).cache()
    assert(s1.filter(col("n_breach") > col("n_total")).count() == 0)
    assert(s1.filter(col("n_breach_recent") > col("n_recent")).count() == 0)
    assert(s1.filter(col("n_breach_recent") > col("n_breach")).count() == 0)
    assert(s1.filter(col("burn_rate") < 0).count() == 0)
  }

  test("ab3: segment arms partition the ab1 population") {
    val a3 = Relational.ab3SegmentedLift(spark, sf).cache()
    val a1 = Relational.ab1AbTest(spark, sf).head()
    assert(a3.agg(sum("n_a")).head.getLong(0) == a1.getAs[Long]("n_a"))
    assert(a3.agg(sum("n_b")).head.getLong(0) == a1.getAs[Long]("n_b"))
    assert(a3.agg(sum("conv_a")).head.getLong(0) == a1.getAs[Long]("conv_a"))
    assert(a3.agg(sum("conv_b")).head.getLong(0) == a1.getAs[Long]("conv_b"))
  }

  test("v24: cascade results are true cosines drawn from the ADC survivors") {
    val v24 = VectorQueries.v24Cascade(spark, sf).cache()
    // exactly k rows per query, scores are genuine cosines
    val perQ = v24.groupBy("query_id").count()
    assert(perQ.filter(col("count") =!= VectorQueries.K).count() == 0)
    val emb = Tables.embeddings(spark, sf)
    val checked = v24
      .join(emb.select(col("vec_id"), col("embedding").as("v")), "vec_id")
      .join(emb.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")), "query_id")
      .withColumn("true_cos",
        round(functions.Vec.cosine(col("qv"), col("v")), 6))
    assert(checked.filter(col("score") =!= col("true_cos")).count() == 0)
    // every result came through the Hamming-m1 shortlist (the ADC tier
    // may legitimately prune candidates v17's direct rescore keeps —
    // that loss is the cascade's declared cost, not an invariant)
    val codes = operators.VectorSearch.binaryQuantize(
      emb.select(col("vec_id"), col("embedding")), "embedding")
    val qb = codes.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"),
        col("code_lo").as("ql"), col("code_hi").as("qh"))
    val cbn = codes.filter(col("vec_id") >= 8)
      .select("vec_id", "code_lo", "code_hi")
    val short = operators.VectorSearch
      .knnHamming(qb, cbn, VectorQueries.CascadeM1)
      .select("query_id", "vec_id")
    assert(v24.select("query_id", "vec_id")
      .join(short, Seq("query_id", "vec_id"), "left_anti").count() == 0)
  }

  test("sw1: native session_window agrees with e2 on session count") {
    val sw = Relational.sw1NativeSession(spark, sf)
    val e2 = Relational.e2Sessions(spark, sf)
    // boundary semantics differ only at gap == 12h exactly — absent in
    // the fixture, so the two sessionizations must coincide
    assert(sw.count() == e2.count())
    assert(sw.agg(sum("n_events")).head.getLong(0)
      == Tables.events(spark, sf).count())
  }

  test("red1: savings consistent with the component table") {
    val r = queries.CorpusQueries.red1DedupSavings(spark, sf).head()
    val comp = queries.CorpusQueries.d8DedupGroups(spark, sf)
    val nComponents = comp.select("component").distinct().count()
    assert(r.getAs[Long]("n_dropped") == comp.count() - nComponents,
      "dropped = members minus one survivor per component")
    assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped")
      == r.getAs[Long]("n_docs"))
    val share = r.getAs[Double]("savings_share")
    assert(share >= 0.0 && share < 1.0)
  }

  test("xl1: template groups have >= 2 docs and valid lang spread") {
    val x = queries.CorpusQueries.xl1CrossLangDups(spark, sf).cache()
    assert(x.count() > 0, "fixture must contain shared templates")
    assert(x.filter(col("n_docs") < 2).count() == 0)
    assert(x.filter(col("n_langs") < 1 || col("n_langs") > col("n_docs"))
      .count() == 0)
  }

  test("jk1: jackknife SE is positive and near the classic SE of the mean") {
    val r = Relational.jk1Jackknife(spark, sf).head()
    val se = r.getAs[Double]("jk_se_dollars")
    assert(se > 0)
    // jackknife SE should be the same order as s/sqrt(n)
    val stats = Tables.orders(spark, sf)
      .agg(stddev("o_totalprice"), count(lit(1))).head()
    val classic = stats.getDouble(0) / math.sqrt(stats.getLong(1).toDouble)
    assert(se > classic / 3 && se < classic * 3,
      s"jk_se $se vs classic $classic")
  }

  test("cl1: cell labels are distinctive (positive score) and bounded") {
    val c = queries.CorpusQueries.cl1CellKeywords(spark, sf).cache()
    assert(c.groupBy("cell_id").count()
      .filter(col("count") > queries.CorpusQueries.CellTerms).count() == 0)
    assert(c.filter(col("rnk") < 1
      || col("rnk") > queries.CorpusQueries.CellTerms).count() == 0)
    // a top label must be overrepresented in its cell (score > 0)
    assert(c.filter(col("rnk") === 1 && col("score") <= 0).count() == 0)
  }

  test("sop1: shares sum to 1 within every region") {
    val s1 = Relational.sop1ShareOfParent(spark, sf).cache()
    val sums = s1.groupBy("r_name").agg(round(sum("share_of_region"), 3).as("s"))
    assert(sums.filter(abs(col("s") - 1.0) > 0.01).count() == 0)
    assert(s1.filter(col("share_of_region") < 0
      || col("share_of_region") > 1).count() == 0)
  }

  test("prc1: recall is monotone non-increasing in the threshold") {
    val p = queries.CorpusQueries.prc1FilterPrCurve(spark, sf)
      .orderBy("threshold").collect()
    assert(p.length == queries.CorpusQueries.PrThresholds.length)
    // tightening the filter can only lose positives
    p.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getAs[Double]("recall") <= lo.getAs[Double]("recall") + 1e-9)
      assert(hi.getAs[Long]("tp") <= lo.getAs[Long]("tp"))
    }
    p.foreach { r =>
      assert(r.getAs[Double]("precision") >= 0 && r.getAs[Double]("precision") <= 1)
      assert(r.getAs[Double]("recall") >= 0 && r.getAs[Double]("recall") <= 1)
    }
  }

  test("r3: ensemble covers every scored pair; consensus implies both >= 4") {
    val r3 = queries.MetricQueries.r3RelevancyEnsemble(spark, sf).cache()
    val pairs = queries.CorpusQueries.d2NgramJaccard(spark, sf).count()
    assert(r3.count() == pairs, "one ensemble row per d2 pair")
    assert(r3.filter(col("consensus_relevant") === 1
      && (col("score_jac") < 4 || col("score_judge") < 4)).count() == 0)
    assert(r3.filter(col("exact_agree") === 1
      && col("score_jac") =!= col("score_judge")).count() == 0)
    assert(r3.filter(col("mean_score") < 1.0 || col("mean_score") > 5.0)
      .count() == 0)
  }

  test("io1: violations bounded by purchasers; fixture funnel is sane") {
    val r = Relational.io1OrderIntegrity(spark, sf).head()
    assert(r.getAs[Long]("n_violations") <= r.getAs[Long]("n_purchasers"))
    assert(r.getAs[Long]("n_purchasers") <= r.getAs[Long]("n_users"))
  }

  test("id1: sequence audit counts are mutually consistent") {
    val r = Relational.id1SequenceGaps(spark, sf).head()
    assert(r.getAs[Long]("n_dupes")
      == r.getAs[Long]("n_rows") - r.getAs[Long]("n_distinct"))
    assert(r.getAs[Long]("n_missing") >= 0)
    assert(r.getAs[Long]("max_id") - r.getAs[Long]("min_id") + 1
      >= r.getAs[Long]("n_distinct"))
  }

  test("km1: quantized Lloyd conserves members and moves centroids") {
    val km = VectorQueries.km1LloydQuantized(spark, sf).cache()
    assert(km.count() == 16)
    assert(km.agg(sum("n_members")).head.getLong(0)
      == Tables.embeddings(spark, sf).count())
    // after two Lloyd rounds at least one centroid must have moved off
    // its seed vector (digests differ from the seed digests)
    val seedDigests = Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * 1e6).cast("long")).as("qv"))
      .withColumn("__h", operators.Sampling.mixedHash(col("vec_id")))
      .orderBy(col("__h").asc, col("vec_id").asc).limit(16)
      .select("qv").collect()
      .map(_.getSeq[Long](0).zipWithIndex.map { case (x, d) => x * (d + 1) }.sum)
    val got = km.orderBy("cell_id").collect().map(_.getLong(2))
    assert(!got.sameElements(seedDigests), "centroids never updated")
  }

  test("fr1: the freshest stream reports zero minutes behind") {
    val f = Relational.fr1Freshness(spark, sf).cache()
    assert(f.filter(col("minutes_behind") < 0).count() == 0)
    assert(f.filter(col("minutes_behind") === 0).count() >= 1,
      "at least one stream defines the feed max")
    assert(f.agg(sum("n_events")).head.getLong(0)
      == Tables.events(spark, sf).count())
  }

  test("ws1: weighted sample keeps exactly the hash-thresholded docs") {
    val w = queries.CorpusQueries.ws1WeightedSample(spark, sf).cache()
    // every kept doc satisfies the threshold, and long docs (p = 1
    // bucket) are kept at a higher rate than short ones
    val docs = Tables.documents(spark, sf)
      .withColumn("h", operators.Sampling.mixedHash(col("doc_id")) % 10000)
      .withColumn("thr", least(col("n_chars"), lit(2000L)) * 5)
    val expect = docs.filter(col("h") < col("thr")).count()
    assert(w.count() == expect)
    assert(w.filter(col("inv_weight") < 1.0).count() == 0,
      "inverse weight is 1/p >= 1")
  }
}
