package graft

import org.apache.spark.sql.functions._

/** Proofs for the SURVEY §5 scale techniques: salting decomposes
  * correctly, and bucketed tables co-locate joins without an exchange.
  */
class ScaleTechniquesSpec extends SparkSpec {

  test("salted aggregation equals the direct aggregation") {
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(round(sum("value"), 4).as("s"), count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    val salted = Dist.saltedSum(Tables.events(spark, sf), "event_type", "value", 8)
      .select(col("event_type"), round(col("sum_value"), 4).as("s"), col("n_rows").as("n"))
      .orderBy("event_type").collect()
    assert(direct.length == salted.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) == s.getString(0) && d.getLong(2) == s.getLong(2))
      assert(math.abs(d.getDouble(1) - s.getDouble(1)) < 1e-6)
    }
  }

  test("partitioned parquet writes enable partition pruning on read") {
    val dir = "/tmp/graft_part_events"
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") &&
      scan.contains("event_type"), s"no partition filter in scan:\n$scan")
    assert(back.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "click").count())
  }

  test("pw2 temporal layout prunes day partitions on a range filter") {
    val df = graft.queries.Relational.pw2TemporalWrite(spark, sf)
    // the pruned read-back equals the direct filter+aggregate
    val direct = Tables.events(spark, sf)
      .filter(to_date(col("ts")).between(lit("2024-01-10"), lit("2024-01-12")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("dn"), round(sum("value"), 2).as("dsum"))
    val joined = df.join(direct, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Long]("dn"))
      assert(math.abs(r.getAs[Double]("sum_value") - r.getAs[Double]("dsum")) < 1e-6)
    }
    // and the scan actually prunes on the day partition column
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pw2_" +
      graft.Dist.pathTag(sf)
    val p = spark.read.parquet(dir)
      .filter(col("day").between(lit("2024-01-10"), lit("2024-01-12")))
      .queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("day"),
      s"no day partition filter:\n$p")
  }

  test("m5 histogram buckets partition the table exactly") {
    val h = graft.queries.Relational.m5Histogram(spark, sf)
    assert(h.agg(sum("n")).head.getLong(0) == Tables.events(spark, sf).count())
    assert(h.groupBy("event_type", "bucket").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("m4 approx percentiles track the exact ones") {
    val exact = graft.queries.MetricQueries.m1LatencyPcts(spark, sf)
      .withColumnRenamed("p50", "e50").withColumnRenamed("p95", "e95")
      .withColumnRenamed("p99", "e99")
    val approx = graft.queries.Relational.m4ApproxRaw(spark, sf)
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("p50") - r.getAs[Double]("e50"))
        <= 0.05 * math.max(1.0, r.getAs[Double]("e50").abs)) }
    // and the gate entry attests exactly that bound: every flag = 1
    val gate = graft.queries.Relational.m4ApproxPcts(spark, sf).collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      assert(r.getAs[Int]("ok_p50") == 1 && r.getAs[Int]("ok_p95") == 1 &&
        r.getAs[Int]("ok_p99") == 1, s"bound flag down in $r") }
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // a fresh session's in-memory catalog forgets the tables but their
    // warehouse directories survive — clear them or CREATE TABLE fails
    val wh = new java.io.File("spark-warehouse")
    Seq("li_b", "o_b").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    // disable broadcast so the join strategy decision is about shuffles
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("bloom semi-join equals the exact semi-join; no false negatives") {
    import graft.operators.BloomJoin
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val exact = li.join(urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi")
    val bloom = BloomJoin.semiJoin(li, "l_orderkey", urgent, "o_orderkey")
    assert(bloom.count() == exact.count())
    assert(bloom.agg(sum("l_quantity")).head() == exact.agg(sum("l_quantity")).head())
  }

  test("bloom prefilter passes every true key and few false positives") {
    import graft.operators.BloomJoin
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bitmap = BloomJoin.buildBitmap(urgent, "o_orderkey")
    val li = Tables.lineitem(spark, sf).select("l_orderkey").cache()
    val trueKeys = li.join(
      urgent.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    val pass = li.filter(
      BloomJoin.mightContain(bitmap, col("l_orderkey"))).count()
    val total = li.count()
    assert(pass >= trueKeys, "bloom filter dropped a true match")
    // fp rate among non-matching rows must stay small (m=2^20, k=3)
    val fp = (pass - trueKeys).toDouble / math.max(total - trueKeys, 1L)
    assert(fp < 0.01, s"false-positive rate $fp")
  }

  test("cdc merge applies I/U/D correctly and rejects malformed ops") {
    import spark.implicits._
    import graft.operators.Upsert
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "p")
    val ch = Seq((2L, "U", 99.0), (3L, "D", 0.0), (4L, "I", 40.0))
      .toDF("k", "op", "p")
    val res = Upsert.cdcMerge(base, ch, "k", "p")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(res == Map(1L -> (10.0, "="), 2L -> (99.0, "U"), 4L -> (40.0, "I")))
    // update for a missing key must raise, not silently insert
    val bad = Seq((9L, "U", 1.0)).toDF("k", "op", "p")
    val ex = intercept[Exception] {
      Upsert.cdcMerge(base, bad, "k", "p").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("cdcMerge")))
  }

  test("compaction collapses fragmented partition dirs to one file each") {
    val res = graft.queries.Relational.u5Compact(spark, sf)
    // aggregate round trip equals the direct aggregation
    val direct = Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val got = res.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == direct)
    // fragmented layout has many files per dir; compacted exactly one
    def parquetFiles(root: String) = {
      val base = new java.io.File(root)
      base.listFiles().filter(_.isDirectory).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    }
    val tmp = System.getProperty("java.io.tmpdir")
    val tag = graft.Dist.pathTag(sf)
    val frag = parquetFiles(s"$tmp/graft_u5f_$tag").toMap
    val comp = parquetFiles(s"$tmp/graft_u5c_$tag").toMap
    assert(comp.values.forall(_ == 1), s"compacted dirs: $comp")
    assert(frag.values.sum > comp.values.sum, s"frag $frag vs comp $comp")
  }

  test("z-order zone maps prune blocks for boxes in BOTH dimensions") {
    import graft.operators.ZOrder
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_spec_" +
      graft.Dist.pathTag(sf)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("yday"))
    ZOrder.writeLayout(ev, "user_id", "yday", dir)
    val stats = ZOrder.blockStats(spark, dir, "user_id", "yday")
    val nBlocks = stats.length
    assert(nBlocks > 4, s"layout degenerated to $nBlocks blocks")
    // a narrow box in EACH single dimension must prune — the property
    // a single-column sort cannot deliver for its non-sorted dimension
    val (u0, u1) = (ev.agg(min("user_id")).head().getLong(0),
      ev.agg(max("user_id")).head().getLong(0))
    val userBox = ZOrder.candidates(stats, u0, u0 + (u1 - u0) / 8, 0L, 365L)
    val dayBox = ZOrder.candidates(stats, Long.MinValue, Long.MaxValue, 2L, 5L)
    assert(userBox.size < nBlocks, s"user box read all $nBlocks blocks")
    assert(dayBox.size < nBlocks, s"day box read all $nBlocks blocks")
    // pruned scan result equals the direct filter (data-derived box so
    // the sf0.001 fixture's small user range still matches rows)
    val (bx0, bx1) = (u0 + (u1 - u0) / 4, u0 + (u1 - u0) / 2)
    val direct = ev.filter(col("user_id").between(bx0, bx1)
        && col("yday").between(9, 18))
      .agg(count(lit(1)), round(sum("value"), 2)).head()
    assert(direct.getLong(0) > 0, "fixture box matched no rows")
    val pruned = ZOrder.prunedScan(spark, dir, stats,
        "user_id", "yday", bx0, bx1, 9L, 18L)
      .agg(count(lit(1)), round(sum("value"), 2)).head()
    assert(direct == pruned)
    // pruning is visible as real partition pruning in the scan plan
    val plan = ZOrder.prunedScan(spark, dir, stats,
      "user_id", "yday", bx0, bx1, 9L, 18L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [block"), plan.take(2000))
  }

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("s"))
      .orderBy("o_orderpriority").collect()
    val salted = Dist.saltedJoin(li, o, "o_orderkey", 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("s"))
      .orderBy("o_orderpriority").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0) && p.getLong(1) == s.getLong(1))
      assert(math.abs(p.getDouble(2) - s.getDouble(2)) < 1e-6)
    }
  }
}
