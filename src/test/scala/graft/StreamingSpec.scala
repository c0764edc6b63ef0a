package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(ts: java.sql.Timestamp, event_type: String, value: Double)

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg over MemoryStream matches the batch transform") {
    val session = spark
    import session.implicits._
    val batch = Tables.events(spark, sf).select("ts", "event_type", "value")
    val rows = batch.as[Ev].collect().toSeq

    val ms = MemoryStream[Ev](spark)
    ms.addData(rows)
    val query = EventStream.hourlyAgg(ms.toDF())
      .writeStream.format("memory").queryName("stream_agg")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("stream_agg")
        .orderBy("window_start", "event_type").collect()
      val batched = EventStream.hourlyAgg(batch)
        .orderBy("window_start", "event_type").collect()
      assert(streamed.length == batched.length && streamed.sameElements(batched))
    } finally query.stop()
  }

  test("streaming sliding-window agg over MemoryStream matches the batch transform") {
    val session = spark
    import session.implicits._
    val batch = Tables.events(spark, sf).select("ts", "event_type", "value")
    val rows = batch.as[Ev].collect().toSeq

    val ms = MemoryStream[Ev](spark)
    ms.addData(rows)
    val query = EventStream.slidingAgg(ms.toDF())
      .writeStream.format("memory").queryName("sliding_agg")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("sliding_agg")
        .orderBy("window_start", "event_type").collect()
      val batched = EventStream.slidingAgg(batch)
        .orderBy("window_start", "event_type").collect()
      assert(streamed.length == batched.length && streamed.sameElements(batched))
      // every event contributes to exactly two windows
      assert(streamed.map(_.getLong(2)).sum == 2 * rows.length)
    } finally query.stop()
  }

  test("streaming consecutive-threshold alerts fire at K breaches and re-arm") {
    val session = spark
    import session.implicits._
    def ev(tpe: String, sec: Int, v: Double) = EventStream.AlertEvent(
      tpe, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec)), v)
    // errorA: 3 breaches -> alert, dip resets, 6 breaches -> two alerts
    val rows = Seq(
      ev("errorA", 1, 9.0), ev("errorA", 2, 9.0), ev("errorA", 3, 9.0),
      ev("errorA", 4, 1.0),
      ev("errorA", 5, 9.0), ev("errorA", 6, 9.0), ev("errorA", 7, 9.0),
      ev("errorA", 8, 9.0), ev("errorA", 9, 9.0), ev("errorA", 10, 9.0),
      // errorB: ends the first batch mid-run (run = 2)
      ev("errorB", 1, 9.0), ev("errorB", 2, 1.0), ev("errorB", 3, 9.0),
      ev("errorB", 4, 9.0))
    val ms = MemoryStream[EventStream.AlertEvent](spark)
    ms.addData(rows)
    val query = EventStream.alertStream(ms.toDS(), 5.0, 3)
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      // the carried run of 2 completes with ONE more breach in the
      // next micro-batch — the alert only exists if state persisted
      ms.addData(Seq(ev("errorB", 6, 9.0)))
      query.processAllAvailable()
      val alerts = spark.table("alerts")
        .orderBy("event_type", "last_us").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      assert(alerts.count(_._1 == "errorA") == 3, s"got ${alerts.toSeq}")
      assert(alerts.filter(_._1 == "errorA").map(_._3).toSeq
        == Seq(3000000L, 7000000L, 10000000L))
      assert(alerts.filter(_._1 == "errorB").map(_._3).toSeq
        == Seq(6000000L), s"errorB run must span micro-batches: ${alerts.toSeq}")
      assert(alerts.forall(_._2 == 3))
    } finally query.stop()
  }

  test("AvailableNow backfill drains a parquet backlog then self-terminates") {
    // the standard backfill shape: point the STREAMING pipeline at the
    // historical files, Trigger.AvailableNow processes everything that
    // exists and stops — one code path for backfill and live tailing
    val batch = Tables.events(spark, sf).select("ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_backfill").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = EventStream.hourlyAgg(stream)
      .writeStream.format("memory").queryName("backfill_agg")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow must terminate on its own")
    val streamed = spark.table("backfill_agg")
      .orderBy("window_start", "event_type").collect()
    val batched = EventStream.hourlyAgg(batch)
      .orderBy("window_start", "event_type").collect()
    assert(streamed.length == batched.length && streamed.sameElements(batched))
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    val session = spark
    import session.implicits._
    case class DupEv(event_id: Long, ts: java.sql.Timestamp, value: Double)
    val t0 = 1700000000000L
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)](spark)
    val df = ms.toDF().toDF("event_id", "ts", "value")
    val q = EventStream.dedupStream(df, "event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val ts1 = new java.sql.Timestamp(t0)
      ms.addData((1L, ts1, 1.0), (1L, ts1, 1.0), (2L, ts1, 2.0))
      q.processAllAvailable()
      ms.addData((1L, ts1, 1.0)) // duplicate in a later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    val session = spark
    import session.implicits._
    val t0 = 1700000000000L
    def t(sec: Long) = new java.sql.Timestamp(t0 + sec * 1000)
    val pms = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val cms = MemoryStream[(Long, Long, java.sql.Timestamp)](spark)
    val purchases = pms.toDF().toDF("event_id", "user_id", "ts")
    val clicks = cms.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStream.purchaseAttribution(purchases, clicks, 600)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      cms.addData((100L, 1L, t(0)), (101L, 1L, t(300)), (102L, 2L, t(0)))
      pms.addData((200L, 1L, t(400)))   // user 1 buys: both clicks in window
      q.processAllAvailable()
      // advance both watermarks far past the interval to flush results
      // (distinct users so the flush rows can't join each other)
      cms.addData((103L, 8L, t(100000)))
      pms.addData((201L, 9L, t(100000)))
      q.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("click_id"))).sorted
      assert(rows.toSeq == Seq((200L, 100L), (200L, 101L)),
        s"unexpected attribution rows: ${rows.toSeq}")
    } finally q.stop()
  }

  test("al1 driver row equals the batch gaps-and-islands rule") {
    // re-arm semantics on a hand fixture: 7 consecutive breaches with
    // runLen 3 must alert at positions 3 and 6 only
    val session = spark
    import session.implicits._
    val t0 = 1700000000000000L
    val evs = (1 to 7).map(i => graft.streaming.EventStream.AlertEvent(
      "a", new java.sql.Timestamp(t0 / 1000 + i * 1000), 10.0)) :+
      graft.streaming.EventStream.AlertEvent(
        "a", new java.sql.Timestamp(t0 / 1000 + 8 * 1000), 0.0)
    val ms = MemoryStream[graft.streaming.EventStream.AlertEvent](spark)
    val q = graft.streaming.EventStream.alertStream(ms.toDS(), 5.0, 3)
      .writeStream.format("memory").queryName("al1spec")
      .outputMode("append").start()
    try {
      ms.addData(evs: _*)
      q.processAllAvailable()
      val alerts = spark.table("al1spec").collect()
        .map(r => r.getAs[Long]("last_us")).sorted
      val us = evs.map(e => graft.streaming.Sessionize.micros(e.ts))
      assert(alerts.toSeq == Seq(us(2), us(5)),
        s"expected alerts at breach 3 and 6, got ${alerts.toSeq}")
    } finally q.stop()
  }

  test("fl1 batch resolve equals the streaming resolve on a hand funnel") {
    // click before the first view must NOT qualify; purchase after the
    // qualifying click must
    val evs = Seq(("click", 5L), ("view", 10L), ("click", 20L),
      ("purchase", 30L))
    val out = graft.streaming.FunnelStream.resolve(7L, evs)
    assert(out == graft.streaming.FunnelStream.FunnelOut(
      7L, Some(10L), Some(20L), Some(30L)))
    val noView = graft.streaming.FunnelStream.resolve(8L,
      Seq(("click", 5L), ("purchase", 6L)))
    assert(noView == graft.streaming.FunnelStream.FunnelOut(
      8L, None, None, None))
  }

  test("streaming agg uses a watermark (bounded state)") {
    val session = spark
    import session.implicits._
    val ms = MemoryStream[Ev](spark)
    val plan = EventStream.hourlyAgg(ms.toDF())
    // the analyzed logical plan carries the event-time watermark node
    assert(plan.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
  }
}
