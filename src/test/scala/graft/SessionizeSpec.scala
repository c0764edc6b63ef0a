package graft

import java.sql.Timestamp

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{EventIn, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  private def ev(uid: Long, minute: Long, v: Double) =
    EventIn(uid, new Timestamp(1700000000000L + minute * 60000), v)

  test("batch sessionization splits on the gap and aggregates per session") {
    val session = spark
    import session.implicits._
    val gapUs = 30L * 60 * 1000000 // 30 min
    val events = Seq(
      ev(1, 0, 1.0), ev(1, 10, 2.0), ev(1, 20, 3.0), // session A: 3 events
      ev(1, 120, 4.0),                               // session B after 100-min gap
      ev(2, 5, 10.0))                                // user 2: one session
    val out = Sessionize.batch(events.toDS(), gapUs)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(out.length == 3)
    assert(out(0) == SessionOut(1, ev(1, 0, 0).ts, ev(1, 20, 0).ts, 3, 6.0))
    assert(out(1) == SessionOut(1, ev(1, 120, 0).ts, ev(1, 120, 0).ts, 1, 4.0))
    assert(out(2).user_id == 2 && out(2).n_events == 1)
  }

  test("batch sessionization over testdata covers every event exactly once") {
    val session = spark
    import session.implicits._
    val df = graft.queries.Relational.e2Sessions(spark, sf)
    assert(df.agg(sum("n_events")).head.getLong(0) == Tables.events(spark, sf).count())
    // session bounds ordered
    assert(df.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("streaming sessionization emits a session once the watermark passes it") {
    val session = spark
    import session.implicits._
    val gapUs = 30L * 60 * 1000000
    val ms = MemoryStream[EventIn](spark)
    val q = Sessionize.stream(ms.toDS(), gapUs, "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      ms.addData(ev(1, 0, 1.0), ev(1, 10, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      // an event far in the future advances the watermark past the gap
      ms.addData(ev(1, 600, 9.0))
      q.processAllAvailable()
      ms.addData(ev(2, 1200, 1.0)) // push watermark again to fire the timeout
      q.processAllAvailable()
      val rows = spark.table("sessions").as[SessionOut].collect()
        .sortBy(_.session_start.getTime)
      assert(rows.nonEmpty, "no session emitted after watermark advance")
      assert(rows.head.n_events == 2 && rows.head.sum_value == 3.0)
    } finally q.stop()
  }
}
