package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming ingest (SURVEY §2.1): event-time tumbling
  * windows with a watermark. The same transform serves batch DataFrames
  * (graft.queries.Relational.e1EventsWindow is its batch parity — same
  * hour buckets, counts and sums) and streaming ones: pass any
  * `readStream`/MemoryStream frame with (ts timestamp, event_type
  * string, value double).
  *
  * At scale this is the canonical shape: watermark bounds state, the
  * windowed aggregation shuffles on (window, event_type), and late rows
  * beyond the watermark are dropped instead of growing state forever.
  */
object EventStream {

  val Watermark = "2 hours"

  /** Streaming exact dedup by id: state holds one entry per id inside
    * the watermark horizon (bounded); late duplicates beyond it are
    * age-dropped — the streaming arm of the Dedup family (SURVEY §2.4).
    */
  def dedupStream(events: DataFrame, idCol: String): DataFrame =
    events.withWatermark("ts", Watermark)
      .dropDuplicates(idCol, "ts")

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks in the preceding `windowSeconds`. Both sides carry
    * watermarks so the join state is bounded — Spark retains only rows
    * inside the interval+watermark horizon (the canonical streaming
    * attribution join).
    */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame,
                          windowSeconds: Long): DataFrame = {
    import org.apache.spark.sql.functions.expr
    // watermarks only on streaming inputs — the same transform is the
    // batch parity (driver entry e3_attribution) with no-op bounds
    val p0 = purchases
    val p = if (p0.isStreaming) p0.withWatermark("ts", Watermark) else p0
    val c0 = clicks
      .withColumnRenamed("ts", "click_ts")
      .withColumnRenamed("event_id", "click_id")
      .withColumnRenamed("user_id", "click_user")
    val c = if (c0.isStreaming) c0.withWatermark("click_ts", Watermark) else c0
    p.join(c,
      expr(s"""user_id = click_user AND
              |click_ts <= ts AND
              |click_ts >= ts - INTERVAL $windowSeconds SECONDS""".stripMargin))
      .select("event_id", "user_id", "ts", "click_id", "click_ts")
  }

  /** Sliding-window aggregation (10-minute windows every 5): each event
    * lands in exactly two windows. Same transform batch or streaming —
    * the driver's batch parity is e5_sliding_window; streaming state is
    * bounded by watermark + window retention exactly like hourlyAgg. */
  def slidingAgg(events: DataFrame): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", Watermark) else events
    // sum as DECIMAL(18,2), one cast to double at output: a rounded
    // plain double sum is aggregation-order-dependent, so boundary
    // cents could flip between engines/partitionings at scale
    src.groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  case class AlertEvent(event_type: String, ts: java.sql.Timestamp,
                        value: Double)
  case class Alert(event_type: String, run_length: Int, last_us: Long)

  /** Streaming consecutive-threshold ALERTS (an1's streaming arm):
    * per event type, emit an alert the moment `runLen` consecutive
    * events (in arrival order within each micro-batch, event-time
    * order inside the batch) exceed `threshold` — the pager rule
    * "alert on K consecutive breaches", kept as ONE integer per key
    * via mapGroupsWithState-style state (flatMapGroups + GroupState):
    * state is a single (current run, last event-time) pair per type —
    * O(#types) state forever, no buffering. Re-arms after each alert
    * (a run of 2·runLen breaches alerts twice). */
  def alertStream(events: org.apache.spark.sql.Dataset[AlertEvent],
                  threshold: Double, runLen: Int)
  : org.apache.spark.sql.Dataset[Alert] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[Int, Alert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[AlertEvent], state: GroupState[Int]) =>
          var run = state.getOption.getOrElse(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[Alert]
          it.toSeq.sortBy(e => (Sessionize.micros(e.ts))).foreach { e =>
            if (e.value > threshold) {
              run += 1
              if (run >= runLen) {
                out += Alert(tpe, run, Sessionize.micros(e.ts))
                run = 0 // re-arm
              }
            } else run = 0
          }
          state.update(run)
          out.iterator
      }
  }

  def hourlyAgg(events: DataFrame): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", Watermark) else events
    // decimal sum for the same reason as slidingAgg — and doubly so
    // here, because bf1 hash-compares the STREAMING result (whose
    // partial-state merge order is scheduler-dependent) to the oracle
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }
}
