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

  test("streaming agg uses a watermark (bounded state)") {
    val session = spark
    import session.implicits._
    val ms = MemoryStream[Ev](spark)
    val plan = EventStream.hourlyAgg(ms.toDF())
    // the analyzed logical plan carries the event-time watermark node
    assert(plan.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
  }
}
