package graft

import graft.operators.FuzzyJoin
import graft.queries.{CorpusQueries, Relational}
import org.apache.spark.sql.functions._

class RelationalNewOpsSpec extends SparkSpec {

  test("saltedSum equals the plain one-phase aggregation") {
    val plain = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(round(sum("value"), 2).as("sum_value"), count(lit(1)).as("n_rows"))
    val salted = Relational.q13SaltedAgg(spark, sf)
    assert(salted.exceptAll(plain).count() == 0L)
    assert(plain.exceptAll(salted).count() == 0L)
  }

  test("fuzzy join: matches within maxDist, blocked plan finds the planted typo") {
    import spark.implicits._
    val clean = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"))
      .toDF("id", "name")
    val dirty = Seq("alpa", "brvo", "zulu").toDF("qname")
    val res = FuzzyJoin.joinByEditDistance(dirty, "qname", clean, "name", 2)
      .select("qname", "name", "dist").collect()
    val m = res.map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(m("alpa") == ("alpha", 1))
    assert(m("brvo") == ("bravo", 1))
    assert(!m.contains("zulu")) // no block/ no match
    // levenshtein beyond the threshold is excluded even inside a block
    val far = FuzzyJoin.joinByEditDistance(
      Seq("axxxx").toDF("qname"), "qname", clean, "name", 2)
    assert(far.count() == 0L)
  }

  test("range window counts only events within the interval, per user") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").cast("long"))
      .rangeBetween(-600, 0)
    val ev = Seq(
      (1L, 7L, "2024-01-01 10:00:00", 1.0),
      (2L, 7L, "2024-01-01 10:05:00", 2.0),
      (3L, 7L, "2024-01-01 10:12:00", 4.0), // 1 fell out (>10min before)
      (4L, 9L, "2024-01-01 10:05:00", 8.0)  // other user unaffected
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val res = ev.withColumn("n", count(lit(1)).over(w))
      .withColumn("s", round(sum("value").over(w), 2))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(res(1L) == (1L, 1.0))
    assert(res(2L) == (2L, 3.0))
    assert(res(3L) == (2L, 6.0))
    assert(res(4L) == (1L, 8.0))
  }

  test("zscore: standardized values have ~zero mean and flagged rows are extreme") {
    val z = Relational.m6Zscore(spark, sf).cache()
    val stats = z.groupBy("event_type")
      .agg(round(avg("z"), 2).as("mz"), max(abs(col("z"))).as("mx"))
      .collect()
    assert(stats.forall(r => math.abs(r.getDouble(1)) <= 0.01))
    val flagged = z.filter(col("is_outlier") === 1)
    assert(flagged.filter(abs(col("z")) <= Relational.ZscoreFlag).count() == 0L)
  }

  test("zscore: singleton group (NULL stddev) emits is_outlier 0, not NULL") {
    import spark.implicits._
    // the sf fixture has no singleton event_type groups, so build a
    // scratch sf dir where one group has exactly one row: stddev_samp
    // is NULL there and the flag must still be 0 (oracle's ELSE 0)
    val dir = java.nio.file.Files.createTempDirectory("m6single").toString
    Seq(
      (1L, 1000000000L, 1L, "solo", 5.0),
      (2L, 2000000000L, 1L, "pair", 1.0),
      (3L, 3000000000L, 2L, "pair", 9.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val rows = Relational.m6Zscore(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), r.getInt(3))).toMap
    assert(rows(1L) == (None, 0)) // z NULL (no spread), flag 0 not NULL
    assert(rows(2L)._1.isDefined && rows(3L)._1.isDefined)
  }

  test("gapfill: missing days appear, forward-filled from the last value") {
    import spark.implicits._
    val daily = Seq(
      ("click", "2024-03-01", 5.0),
      ("click", "2024-03-04", 7.0), // 2nd/3rd missing
      ("view", "2024-03-02", 1.0)
    ).toDF("event_type", "day", "day_value")
      .withColumn("day", col("day").cast("date"))
    val spans = daily.groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
    val allDays = spans.select(col("event_type"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val filled = allDays.join(daily, Seq("event_type", "day"), "left")
      .withColumn("filled_value", last("day_value", ignoreNulls = true).over(w))
      .withColumn("is_gap", col("day_value").isNull.cast("int"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(3), r.getInt(4))).toMap
    assert(filled(("click", "2024-03-02")) == (5.0, 1)) // gap, carried 5.0
    assert(filled(("click", "2024-03-03")) == (5.0, 1))
    assert(filled(("click", "2024-03-04")) == (7.0, 0))
    assert(filled(("view", "2024-03-02")) == (1.0, 0))
    assert(filled.size == 5)
  }

  test("profile emits one row per column from a single scan") {
    val p = Relational.pr1Profile(spark, sf)
    val rows = p.collect()
    assert(rows.map(_.getString(1)).toSet == Relational.ProfileCols.toSet)
    assert(rows.map(_.getLong(0)).distinct.length == 1) // same scan count
    rows.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(5)) // min <= max
    }
    // Spark's exact multi-column distinct rewrite adds one extra scan
    // branch; anything beyond that means per-column scans crept in. (At
    // 100 TB profiling switches to approx_count_distinct — q12's HLL
    // path — and this collapses to a single scan.)
    val plan = p.queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).size <= 2,
      s"profile should not scan once per column:\n$plan")
  }

  test("window suite: lag/lead/percent_rank/ntile agree with hand math") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Seq(
      (1L, 7L, "2024-01-01 10:00:00", 1.0),
      (2L, 7L, "2024-01-01 10:01:00", 2.0),
      (3L, 7L, "2024-01-01 10:02:00", 4.0),
      (4L, 7L, "2024-01-01 10:03:00", 8.0)
    ).toDF("event_id", "user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val res = ev
      .withColumn("prev_value", round(lag("value", 1).over(w), 2))
      .withColumn("next_value", round(lead("value", 1).over(w), 2))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("quartile", ntile(4).over(w))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(res(1L).isNullAt(4) && res(1L).getDouble(5) == 2.0)
    assert(res(2L).getDouble(4) == 1.0 && res(2L).getDouble(5) == 4.0)
    assert(res(4L).isNullAt(5)) // last row has no lead
    // percent_rank = (rank-1)/(n-1) over 4 rows: 0, 1/3, 2/3, 1
    assert(res(2L).getDouble(6) == BigDecimal(1.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(res(4L).getDouble(6) == 1.0)
    // ntile(4) over 4 rows: one per bucket, in order
    assert((1 to 4).map(i => res(i.toLong).getInt(7)) == Seq(1, 2, 3, 4))
  }

  test("scd2: updated keys get chained intervals, others one current row") {
    val scd = CorpusQueries.u4Scd2(spark, sf).cache()
    val updated = scd.filter(col("o_orderkey") % 10 === 0)
    // updated keys: v0 closed by v1 (valid_to = 1), v1 current
    assert(updated.filter(col("version") === 0)
      .filter(col("valid_to") =!= 1 || col("is_current") =!= 0).count() == 0L)
    assert(updated.filter(col("version") === 1)
      .filter(!col("valid_to").isNull || col("is_current") =!= 1).count() == 0L)
    // untouched keys have exactly one, current, version-0 row
    val untouched = scd.filter(col("o_orderkey") % 10 =!= 0)
    assert(untouched.filter(col("is_current") =!= 1).count() == 0L)
    // exactly one current row per key overall
    val perKey = scd.filter(col("is_current") === 1)
      .groupBy("o_orderkey").count().filter(col("count") =!= 1).count()
    assert(perKey == 0L)
  }

  test("tfidf keywords: ubiquitous tokens never win over distinctive ones") {
    import spark.implicits._
    val docs = Seq(
      (10L, "zebra zebra common common common"),
      (20L, "yak common common"),
      (30L, "wolf common")
    ).toDF("doc_id", "text")
    // 'common' appears in all 3 docs -> idf = ln(1) = 0; each doc's top
    // keyword must be its distinctive token
    val toks = graft.Dist.spread(
      docs.select(col("doc_id"), graft.operators.Embed.tokens(col("text")).as("tk")))
      .filter(size(col("tk")) > 0)
    val tf = toks.select(col("doc_id"), explode(col("tk")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val nd = tf.agg(countDistinct("doc_id").as("n_docs"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term").crossJoin(broadcast(nd))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .select("doc_id", "term", "score")
    val top1 = graft.plans.TopK.perKey(scored, Seq("doc_id"),
      Seq(col("score").desc, col("term").asc), 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top1 == Map(10L -> "zebra", 20L -> "yak", 30L -> "wolf"))
  }

  test("tt1 time-travel to version 0 reproduces the original table exactly") {
    val r = CorpusQueries.tt1TimeTravel(spark, sf).head
    val orig = Tables.orders(spark, sf)
      .agg(count(lit(1)), countDistinct("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")).head
    assert(r.getLong(0) == orig.getLong(0))
    assert(r.getLong(1) == orig.getLong(1))
    assert(r.getDouble(2) == orig.getDouble(2))
    // and the CURRENT state differs (the v1 updates shifted prices)
    val current = CorpusQueries.u4Scd2(spark, sf)
      .filter(col("is_current") === 1)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")).head
    assert(current.getDouble(0) > r.getDouble(2))
  }

  test("coh1 cohort retention: offset-0 is 1.0, offsets non-negative, totals conserve") {
    val rows = Relational.coh1Cohort(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0, "week_offset non-negative")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0, "retention in (0,1]")
    }
    val offset0 = rows.filter(_.getLong(1) == 0L)
    assert(offset0.forall(_.getDouble(3) == 1.0), "offset 0 retention is 1.0 by definition")
    // every user appears in exactly one cohort at offset 0
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(offset0.map(_.getLong(2)).sum == totalUsers)
  }

  test("ord1 global rank equals a driver-side total sort, no one-task window") {
    val got = Relational.ord1GlobalRank(spark, sf).collect()
      .sortBy(_.getLong(0))
    val expect = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .sortBy { case (ok, ln, p) => (-p, ok, ln) }
      .take(1000)
    assert(got.length == expect.length)
    got.zip(expect).zipWithIndex.foreach { case ((g, (ok, ln, p)), i) =>
      assert(g.getLong(0) == i + 1, s"rank at position $i")
      assert(g.getLong(1) == ok && g.getInt(2) == ln && g.getDouble(3) == p,
        s"row at rank ${i + 1}")
    }
  }
}
