package graft

import graft.queries.MetricQueries
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  test("m1 percentiles are ordered p50 <= p95 <= p99 per group") {
    val rows = MetricQueries.m1LatencyPcts(spark, sf).collect()
    assert(rows.length == 5) // one per event_type
    assert(rows.forall { r =>
      val (p50, p95, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      p50 <= p95 && p95 <= p99 })
  }

  test("m1 p50 equals the numpy-style interpolated median") {
    val vals = Tables.events(spark, sf).filter(col("event_type") === "click")
      .select("value").collect().map(_.getDouble(0)).sorted
    val pos = (vals.length - 1) * 0.5
    val lo = pos.toInt
    val expect = if (pos == lo) vals(lo)
      else vals(lo) + (vals(lo + 1) - vals(lo)) * (pos - lo)
    val got = MetricQueries.m1LatencyPcts(spark, sf)
      .filter(col("event_type") === "click").head.getDouble(1)
    assert(math.abs(got - BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("m2 recall is n_relevant / k in [0,1]") {
    val rows = MetricQueries.m2Recall(spark, sf).collect()
    assert(rows.length == 8)
    assert(rows.forall { r =>
      val recall = r.getDouble(2)
      recall >= 0.0 && recall <= 1.0 &&
        math.abs(recall - r.getLong(1).toDouble / 5) < 1e-6 })
  }

  test("m3 ndcg is 1 when all top-k are relevant, else in [0,1]") {
    val m2 = MetricQueries.m2Recall(spark, sf)
    val m3 = MetricQueries.m3Ndcg(spark, sf)
    val j = m2.join(m3, "query_id").collect()
    assert(j.forall { r =>
      val n = r.getAs[Double]("ndcg"); n >= 0.0 && n <= 1.0 })
    // perfect recall => perfect ndcg
    assert(j.filter(_.getAs[Double]("recall") == 1.0)
      .forall(_.getAs[Double]("ndcg") == 1.0))
  }

  test("m0 summary row reproduces the reference averaging rules") {
    val row = MetricQueries.m0IrSummary(spark, sf).head
    val m2 = MetricQueries.m2Recall(spark, sf).filter(col("n_relevant") > 0)
      .agg(avg("recall")).head.getDouble(0)
    assert(math.abs(row.getAs[Double]("avg_recall")
      - BigDecimal(m2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("r1 relevancy maps jaccard onto the 1-5 scale with threshold 4") {
    val rows = MetricQueries.r1Relevancy(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val s = r.getLong(2)
      s >= 1 && s <= 5 && (r.getInt(3) == 1) == (s >= 4) })
  }

  test("m9 average precision replays the textbook formula per query") {
    val labeled = MetricQueries.labeledKnn(spark, sf)
      .select("query_id", "rnk", "rel").collect()
      .groupBy(_.getLong(0))
    val got = MetricQueries.m9Map(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 8)
    labeled.foreach { case (q, rows) =>
      val rels = rows.sortBy(_.getInt(1)).map(_.getInt(2))
      val hits = rels.zipWithIndex.filter(_._1 == 1)
      val expect =
        if (hits.isEmpty) 0.0
        else {
          val ap = hits.map { case (_, idx) =>
            rels.take(idx + 1).sum.toDouble / (idx + 1) }.sum / hits.length
          BigDecimal(ap).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      assert(math.abs(got(q) - expect) < 2e-6, s"ap mismatch for query $q")
    }
    assert(got.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("m7 median/MAD/outlier-count match a driver-side recomputation") {
    def interp(sorted: Array[Double], q: Double): Double = {
      val pos = (sorted.length - 1) * q
      val lo = pos.toInt
      if (pos == lo) sorted(lo)
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (pos - lo)
    }
    val byType = Tables.events(spark, sf).select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getDouble(1)) }
    val got = MetricQueries.m7Mad(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(got.size == byType.size)
    byType.foreach { case (t, vals) =>
      val med = interp(vals.sorted, 0.5)
      val devs = vals.map(v => math.abs(v - med))
      val mad = interp(devs.sorted, 0.5)
      val nOut = devs.count(_ > 3.0 * 1.4826 * mad).toLong
      val (gm, gmad, gn) = got(t)
      assert(math.abs(gm - med) < 1e-6 && math.abs(gmad - mad) < 1e-6,
        s"med/mad mismatch for $t")
      assert(gn == nOut, s"outlier count mismatch for $t: $gn vs $nOut")
    }
  }

  test("m10 winsorize clamps ~10% of rows to the exact p05/p95 cuts") {
    def interp(sorted: Array[Double], q: Double): Double = {
      val pos = (sorted.length - 1) * q
      val lo = pos.toInt
      if (pos == lo) sorted(lo)
      else sorted(lo) + (sorted(lo + 1) - sorted(lo)) * (pos - lo)
    }
    val byType = Tables.events(spark, sf).select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getDouble(1)).sorted }
    val rows = MetricQueries.m10Winsorize(spark, sf).collect()
    assert(rows.length == Tables.events(spark, sf).count())
    rows.groupBy(_.getString(1)).foreach { case (t, rs) =>
      val lo = interp(byType(t), 0.05)
      val hi = interp(byType(t), 0.95)
      rs.foreach { r =>
        val (v, w, c) = (r.getDouble(2), r.getDouble(3), r.getInt(4))
        val expect = math.min(math.max(v, lo), hi)
        assert(math.abs(w - expect) < 1e-6, s"clamp value for $t")
        assert((c == 1) == (v < lo || v > hi), s"clamp flag for $t")
      }
      // ~10% of each group clamps (within interpolation slack)
      val frac = rs.count(_.getInt(4) == 1).toDouble / rs.length
      assert(frac > 0.05 && frac < 0.15, s"clamped fraction $frac for $t")
    }
  }

  test("st2 KS statistic equals a driver-side ECDF recomputation") {
    val row = MetricQueries.st2KsTest(spark, sf).head
    val (na, nb, dNum, ks) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = vals.filter(_._1 == "click").map(_._2).sorted
    val b = vals.filter(_._1 == "view").map(_._2).sorted
    assert(na == a.length.toLong && nb == b.length.toLong)
    val support = (a ++ b).distinct.sorted
    val expectNum = support.map { v =>
      math.abs(a.count(_ <= v).toLong * nb - b.count(_ <= v).toLong * na)
    }.max
    assert(dNum == expectNum)
    assert(math.abs(ks - expectNum.toDouble / (na * nb)) < 1e-6)
    // identical samples give D = 0
    import spark.implicits._
    val same = Seq(("x", 1.0), ("x", 2.0), ("y", 1.0), ("y", 2.0))
      .toDF("g", "value")
    val r0 = graft.operators.IrMetrics.ksTest(same, "g", "value", "x", "y").head
    assert(r0.getLong(2) == 0L && r0.getDouble(3) == 0.0)
  }

  test("qd1 quartile bands are equi-depth and conserve every row") {
    val rows = MetricQueries.qd1QuartileDepth(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getInt(1)).toSet == Set(0, 1, 2, 3), s"bands for $t")
      val counts = rs.map(_.getLong(2))
      // equi-depth: no band deviates more than a couple rows from n/4
      assert(counts.max - counts.min <= 3, s"uneven bands for $t: ${counts.toSeq}")
    }
  }
}
