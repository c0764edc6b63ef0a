package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

class RelationalExtrasSpec extends SparkSpec {

  test("q9 running total ends at each customer's total spend") {
    val last = Relational.q9RunningTotal(spark, sf)
      .groupBy("o_custkey").agg(max("running_spend").as("final_spend"))
    val direct = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("total"))
    val joined = last.join(direct, "o_custkey")
      .filter(abs(col("final_spend") - col("total")) > 0.02)
    assert(joined.count() == 0)
  }

  test("q10 distinct counts are bounded by table cardinalities") {
    val rows = Relational.q10Distinct(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.forall(r => r.getAs[Long]("n_users") <= users && r.getAs[Long]("n_days") <= 31))
  }

  test("j1 json extraction buckets all events") {
    val df = Relational.j1JsonExtract(spark, sf)
    assert(df.agg(sum("n")).head.getLong(0) == Tables.events(spark, sf).count())
    assert(df.count() == 10)
  }

  test("o1 anti join and its complement partition the customers") {
    val anti = Relational.o1AntiJoin(spark, sf).count()
    val semi = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti + semi == Tables.customer(spark, sf).count())
  }

  test("p1 pivot cells sum to the event count") {
    val df = Relational.p1Pivot(spark, sf)
    val total = Relational.PivotTypes
      .map(t => df.agg(sum(col(t))).head.getLong(0)).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("q11 selects only orders strictly above their customer's average") {
    val out = Relational.q11AboveAvg(spark, sf)
    val avgs = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(avg("o_totalprice").as("cavg"))
    assert(out.join(avgs, "o_custkey")
      .filter(col("o_totalprice") <= col("cavg")).count() == 0)
  }

  test("u2 set ops exclude every open-order customer") {
    val open = Tables.orders(spark, sf).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey")).distinct()
    assert(Relational.u2SetOps(spark, sf).join(open, "custkey").count() == 0)
  }

  test("b1 range join covers every part exactly once") {
    val df = Relational.b1RangeJoin(spark, sf)
    assert(df.agg(sum("n_parts")).head.getLong(0) == Tables.part(spark, sf).count())
    assert(df.count() == Relational.SizeBands.length)
  }

  test("c1 cube grand total equals the filtered line count") {
    val grand = Relational.c1Cube(spark, sf)
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .head.getAs[Long]("n")
    assert(grand == Tables.lineitem(spark, sf).count())
  }

  test("a1 asof output references real purchase and click events") {
    val ev = Tables.events(spark, sf).select("event_id", "event_type")
    val out = Relational.a1Asof(spark, sf)
    assert(out.join(ev.withColumnRenamed("event_id", "click_id"), "click_id")
      .filter(col("event_type") =!= "click").count() == 0)
    assert(out.join(ev, "event_id")
      .filter(col("event_type") =!= "purchase").count() == 0)
  }

  test("e5 sliding windows: every event lands in exactly two 5-min-aligned windows") {
    val res = Relational.e5SlidingWindow(spark, sf).cache()
    val totalEvents = Tables.events(spark, sf).count()
    assert(res.agg(sum("n_events")).head.getLong(0) == 2 * totalEvents)
    // window starts align to the 5-minute slide grid
    assert(res.filter(expr("CAST(window_start AS LONG) % 300 != 0")).count() == 0L)
    // hand case: an event at 10:07 belongs to the 10:00 and 10:05 windows
    import spark.implicits._
    val one = Seq(("click", "2024-01-01 10:07:00", 1.0))
      .toDF("event_type", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .count()
      .select(col("w.start").cast("string").as("s")).collect().map(_.getString(0)).sorted
    assert(one.toSeq == Seq("2024-01-01 10:00:00", "2024-01-01 10:05:00"))
  }

  test("uv1 unpivot melts the pivot back to the direct long aggregate") {
    val melted = Relational.uv1Unpivot(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = Tables.events(spark, sf)
      .withColumn("user_bucket", col("user_id") % 10)
      .groupBy("user_bucket", "event_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // every direct cell appears; melted zeros only where direct has no rows
    direct.foreach { case (k, v) => assert(melted(k) == v, s"cell $k") }
    melted.foreach { case (k, v) => assert(v == direct.getOrElse(k, 0L), s"cell $k") }
    assert(melted.size == 10 * Relational.PivotTypes.size)
  }

  test("q18 deciles: exhaustive, ordered by spend, shares sum to 1") {
    val rows = Relational.q18Deciles(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    val custCount = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == custCount)
    // decile sizes differ by at most 1 (balanced cut)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    // top decile out-spends the bottom on average
    assert(rows.head.getDouble(3) > rows.last.getDouble(3))
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
  }

  test("an1 episodes merge consecutive hot hours on a hand fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("an1spec").toString
    // hours 0,1,2 hot (burst), hour 5 hot, hours 8..30 one error each
    // (23 quiet hours drag the mean below the burst counts)
    val rows = Seq(0 -> 5, 1 -> 4, 2 -> 6, 5 -> 5) ++ (8 to 30).map(_ -> 1)
    // ts stored as TIMESTAMP(NANOS)-style long, like the real events table
    val evs = rows.zipWithIndex.flatMap { case ((h, n), i) =>
      (0 until n).map(j =>
        (i * 100L + j, h * 3600L * 1000000000L, 1L, "error", 1.0))
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val eps = Relational.an1AlertEpisodes(spark, dir).collect()
      .map(r => r.getTimestamp(0).getTime / 3600000L ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // mean errors/hour = 43/27 ≈ 1.6 → hot iff cnt ≥ 2: hours 0-2 and 5
    assert(eps.keySet == Set(0L, 5L))
    assert(eps(0L) == ((3L, 15L, 6L)), "burst episode: 3 hours, 15 errors, peak 6")
    assert(eps(5L) == ((1L, 5L, 5L)))
  }

  test("seq2 transition probabilities row-normalize and count real successions") {
    val rows = Relational.seq2Transitions(spark, sf).collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (f, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"probs from $f sum to $p")
    }
    // total transitions = total events - one per user (last has no successor)
    val totalEvents = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == totalEvents - users)
  }

  test("ra1 rolling actives: wau >= dau, windows accumulate, driver recomputation agrees") {
    val rows = Relational.ra1RollingActive(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (dau, wau) => assert(dau <= wau && dau >= 0) }
    val pairs = Tables.events(spark, sf)
      .select(expr("datediff(CAST(ts AS DATE), DATE'2024-01-01')").as("day"),
        col("user_id")).distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val days = pairs.map(_._1).distinct
    days.foreach { d =>
      val wau = pairs.filter(p => p._1 >= d - 6 && p._1 <= d).map(_._2).distinct.length
      val dau = pairs.filter(_._1 == d).map(_._2).distinct.length
      assert(rows(d) == ((dau.toLong, wau.toLong)), s"day $d")
    }
  }

  test("pc1 percent change replays the lag formula over exact weekly revenue") {
    val rows = Relational.pc1PeriodOverPeriod(spark, sf).collect()
      .sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    assert(rows.head.isNullAt(3) && rows.head.isNullAt(4), "first week has no prior")
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getDouble(3) == prev.getDouble(2), "prev_revenue chains")
        val expect = (cur.getDouble(2) - prev.getDouble(2)) / prev.getDouble(2)
        assert(math.abs(cur.getDouble(4) - expect) < 1e-6)
      case _ =>
    }
    // total orders conserve
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
  }

  test("ab1 conversion counts, lift, and z agree with a driver-side recomputation") {
    val r = Relational.ab1AbTest(spark, sf).head
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = Tables.events(spark, sf)
      .select("user_id", "event_type", "value").collect()
      .groupBy(_.getLong(0))
      .map { case (u, evs) => u -> evs.exists(e =>
        e.getString(1) == "purchase" && e.getDouble(2) > 150.0) }
    assert(na == users.count(_._1 % 2 == 0) && nb == users.count(_._1 % 2 == 1))
    assert(ca == users.count(kv => kv._1 % 2 == 0 && kv._2))
    assert(cb == users.count(kv => kv._1 % 2 == 1 && kv._2))
    val (pa, pb) = (ca.toDouble / na, cb.toDouble / nb)
    val p = (ca + cb).toDouble / (na + nb)
    // the fixture must not saturate, or the test exercises only the guard
    assert(p > 0.0 && p < 1.0, s"degenerate conversion rate $p")
    val z = (pa - pb) / math.sqrt(p * (1 - p) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getDouble(4) - (pb / pa - 1)) < 1e-6)
    assert(math.abs(r.getDouble(5) - z) < 1e-6)
  }

  test("nu1 new users conserve and accumulate monotonically") {
    val rows = Relational.nu1NewUsers(spark, sf).collect().sortBy(_.getInt(0))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users)
    assert(rows.last.getLong(2) == users, "cumulative ends at total users")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) == a.getLong(2) + b.getLong(1), "prefix sums chain")
      case _ =>
    }
  }

  test("chrn1 churn matches a driver-side membership recomputation") {
    val pairs = Tables.events(spark, sf)
      .select(expr("datediff(CAST(ts AS DATE), DATE'2024-01-01') div 7").as("week"),
        col("user_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = pairs.groupBy(_._1).map { case (w, ps) => w -> ps.map(_._2).toSet }
    val maxW = byWeek.keys.max
    val got = Relational.chrn1Churn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == byWeek.keySet.filter(_ < maxW))
    got.foreach { case (w, (active, churned)) =>
      assert(active == byWeek(w).size.toLong, s"active week $w")
      val expect = (byWeek(w) -- byWeek.getOrElse(w + 1, Set.empty)).size.toLong
      assert(churned == expect, s"churned week $w")
    }
  }

  test("path1 trigram paths conserve and rank by frequency") {
    val rows = Relational.path1CommonJourneys(spark, sf).collect()
    assert(rows.length == 10)
    val counts = rows.sortBy(_.getInt(2)).map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, "ranked desc")
    rows.foreach(r => assert(r.getString(0).split(">").length == 3))
    // total trigrams = events - 2 per user (sequence ends)
    val total = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val allTri = Relational.path1CommonJourneys(spark, sf) // top-10 only; recompute full
    val fullCount = Tables.events(spark, sf)
      .select(col("user_id")).groupBy("user_id").count()
      .collect().map(r => math.max(0L, r.getLong(1) - 2)).sum
    assert(fullCount == total - 2 * users)
  }

  test("imp1 imputation fills every 13th event with its group mean, keeps the rest") {
    val rows = Relational.imp1Impute(spark, sf).collect()
    assert(rows.length == Tables.events(spark, sf).count())
    val flagged = rows.filter(_.getInt(3) == 1)
    assert(flagged.nonEmpty && flagged.forall(_.getLong(0) % 13 == 0))
    // non-imputed rows keep their original value
    val orig = Tables.events(spark, sf).select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.filter(_.getInt(3) == 0).foreach { r =>
      assert(math.abs(r.getDouble(2) - orig(r.getLong(0))) < 1e-9)
    }
    // imputed values equal the non-null group mean
    val means = Tables.events(spark, sf)
      .filter(col("event_id") % 13 =!= 0)
      .groupBy("event_type").agg(avg("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    flagged.foreach { r =>
      assert(math.abs(r.getDouble(2) - means(r.getString(1))) < 1e-5,
        s"imputed mean for ${r.getString(1)}")
    }
  }

  test("jc1 predicted self-join cardinality equals the actual join size") {
    val r = Relational.jc1JoinCardinality(spark, sf).collect()
    assert(r.length == 5)
    val predicted = r.head.getLong(5)
    val actual = Tables.events(spark, sf).select("user_id", "event_id").as("a")
      .join(Tables.events(spark, sf).select("user_id").as("b"), "user_id")
      .count()
    assert(predicted == actual, s"predicted $predicted vs actual $actual")
    assert(r.head.getLong(6) == Tables.events(spark, sf).count())
    // ranked by per-key contribution
    val shares = r.sortBy(_.getInt(0)).map(_.getLong(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
  }

  test("acf1 lag-1 autocorrelation matches the textbook centered formula") {
    val r = Relational.acf1Autocorr(spark, sf).head
    val weekly = Tables.orders(spark, sf)
      .select(expr("datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') div 7").as("w"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("w").agg(sum("c").as("rev")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).sortBy(_._1).map(_._2.toDouble)
    val n = weekly.length
    val m = weekly.sum / n
    val num = weekly.dropRight(1).zip(weekly.tail)
      .map { case (a, b) => (a - m) * (b - m) }.sum
    val den = weekly.map(v => (v - m) * (v - m)).sum
    val expect = num / den
    assert(r.getLong(0) == n.toLong)
    assert(math.abs(r.getDouble(1) - expect) < 1e-4,
      s"acf ${r.getDouble(1)} vs $expect")
    assert(r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0)
  }

  test("hb1 EWMA replays the integer halving recurrence in week order") {
    val rows = Relational.hb1Ewma(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    var s = 0L
    rows.foreach { r =>
      s = (s + r.getLong(1)) / 2
      assert(r.getLong(2) == s, s"smoothed at week ${r.getLong(0)}")
    }
    // smoothing is bounded by the running max
    var mx = 0L
    rows.foreach { r => mx = math.max(mx, r.getLong(1)); assert(r.getLong(2) <= mx) }
  }

  test("cp1 change point: argmax CUSUM matches a driver recomputation; planted shift found") {
    val r = Relational.cp1ChangePoint(spark, sf).head
    val weekly = Tables.orders(spark, sf)
      .select(expr("datediff(CAST(o_orderdate AS DATE), DATE'1995-01-01') div 7").as("w"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("w").agg(sum("c").as("rev")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).sortBy(_._1)
    val total = weekly.map(_._2).sum
    val n = weekly.length.toLong
    var cum = 0L
    val scores = weekly.zipWithIndex.map { case ((wk, rev), i) =>
      cum += rev
      (wk, math.abs(cum * n - (i + 1) * total))
    }
    val best = scores.minBy { case (wk, s) => (-s, wk) }
    assert(r.getLong(0) == best._1 && r.getLong(1) == best._2)
    // a hand series with an obvious level shift pinpoints it
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cp1spec").toString
    val rows = (0 until 20).map { i =>
      val wk = java.sql.Timestamp.valueOf(s"1995-01-01 00:00:00").getTime +
        i.toLong * 7 * 86400000L
      val price = if (i < 10) 100.0 else 200.0 // shift at week 10
      (i.toLong, 1L, "O", price, new java.sql.Timestamp(wk), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    rows.write.parquet(s"$dir/orders.parquet")
    val planted = Relational.cp1ChangePoint(spark, dir).head
    assert(planted.getLong(0) == 9L,
      s"CUSUM peaks at the last pre-shift week, got ${planted.getLong(0)}")
  }

  test("mb1 market basket: supports and lift agree with a driver-side recount") {
    val rows = Relational.mb1MarketBasket(spark, sf).collect()
    assert(rows.length == 20)
    val baskets = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = baskets.groupBy(_._1).map { case (o, ps) => o -> ps.map(_._2).toSet }
    val partCount = baskets.groupBy(_._2).map { case (p, os) => p -> os.length.toLong }
    val nOrders = byOrder.size.toLong
    rows.foreach { r =>
      val (a, b, sup) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b)
      val expect = byOrder.values.count(s => s.contains(a) && s.contains(b)).toLong
      assert(sup == expect, s"support for ($a,$b)")
      val lift = sup.toDouble * nOrders / (partCount(a) * partCount(b))
      assert(math.abs(r.getDouble(3) - lift) < 1e-5, s"lift for ($a,$b)")
      assert(math.abs(r.getDouble(4) - sup.toDouble / partCount(a)) < 1e-6)
      assert(math.abs(r.getDouble(5) - sup.toDouble / partCount(b)) < 1e-6)
    }
  }

  test("cg1 typed cogroup counts both sides per key, including one-sided keys") {
    val rows = Relational.cg1Cogroup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.values.map(_._1).sum == Tables.orders(spark, sf).count())
    assert(rows.values.map(_._2).sum == Tables.events(spark, sf).count())
    // keys present on only one side appear with a zero on the other
    assert(rows.values.exists { case (o, e) => o > 0 && e == 0 })
    assert(rows.values.forall { case (o, e) => o > 0 || e > 0 })
  }

  test("wm1 weighted median equals a driver-side weighted-rank scan") {
    val r = Relational.wm1WeightedMedian(spark, sf).head
    val li = Tables.lineitem(spark, sf)
      .select("l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber")
      .collect()
      .map(x => (x.getDouble(0), x.getDouble(1).toLong, x.getLong(2), x.getInt(3)))
      .sortBy { case (p, _, ok, ln) => (p, ok, ln) }
    val total = li.map(_._2).sum
    var cum = 0L
    val med = li.find { row => cum += row._2; cum * 2 >= total }.get._1
    assert(r.getLong(0) == total)
    assert(r.getDouble(1) == med)
  }

  test("st3 ANOVA F matches a driver-side recomputation") {
    val r = Relational.st3Anova(spark, sf).head
    val vals = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(x => x.getString(0) -> x.getDouble(1))
    val groups = vals.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2) }
    val n = vals.length
    val k = groups.size
    val grand = vals.map(_._2).sum / n
    val ssb = groups.values.map { vs =>
      val m = vs.sum / vs.length; vs.length * (m - grand) * (m - grand) }.sum
    val ssw = groups.values.map { vs =>
      val m = vs.sum / vs.length; vs.map(v => (v - m) * (v - m)).sum }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(r.getInt(0) == k && r.getLong(1) == n.toLong)
    assert(math.abs(r.getDouble(2) - ssb) < 0.05 * ssb + 1e-3, "ss_between")
    assert(math.abs(r.getDouble(3) - ssw) < 1e-4 * ssw, "ss_within")
    assert(math.abs(r.getDouble(4) - f) < 0.06 * math.abs(f) + 1e-3, "F")
  }

  test("rfm1 segments conserve customers and spend; quintiles are balanced") {
    val rows = Relational.rfm1RfmSegments(spark, sf).collect()
    val custCount = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == custCount)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    // every segment code is three quintile digits 0-4
    rows.foreach { r =>
      val parts = r.getString(0).split("-")
      assert(parts.length == 3 && parts.forall(p => p.toInt >= 0 && p.toInt <= 4),
        s"segment ${r.getString(0)}")
    }
    // each monetary quintile holds ~n/5 customers (balanced by construction)
    val mCounts = rows.groupBy(_.getString(0).split("-")(2))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).sum }
    assert(mCounts.values.max - mCounts.values.min <= 1)
  }

  test("sql1 SQL-text query equals the equivalent DataFrame formulation") {
    val viaSql = Relational.sql1SqlApi(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val viaDf = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1) - col("l_discount")).cast("decimal(5,2)"))
          .cast("double").as("rev"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(viaSql == viaDf)
  }

  test("fp1 fingerprint is partition-order independent and row-sensitive") {
    val a = Relational.fp1Fingerprint(spark, sf).head
    val b = Relational.fp1Fingerprint(spark, sf).head // independent plan, new shuffle order
    assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1)
      && a.getLong(2) == b.getLong(2))
    // a modified copy fingerprints differently
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fp1spec").toString
    Tables.documents(spark, sf)
      .withColumn("n_chars",
        when(col("doc_id") === 0, col("n_chars") + 1).otherwise(col("n_chars")))
      .write.parquet(s"$dir/documents.parquet")
    val c = Relational.fp1Fingerprint(spark, dir).head
    assert(c.getLong(0) == a.getLong(0))
    assert(c.getLong(1) != a.getLong(1) || c.getLong(2) != a.getLong(2),
      "one-row change must move the fingerprint")
  }

  test("dd1 diff counts partition the key space and match the synthetic edit rule") {
    val r = Relational.dd1TableDiff(spark, sf).head
    val base = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0))
    val added = base.count(_ % 101 == 0).toLong
    val removed = base.count(_ % 97 == 0).toLong
    val changed = base.count(k => k % 97 != 0 && k % 100 == 0).toLong
    assert(r.getLong(0) == added, "added")
    assert(r.getLong(1) == removed, "removed")
    assert(r.getLong(2) == changed, "changed")
    assert(r.getLong(3) == base.length - removed - changed, "same")
  }
}
