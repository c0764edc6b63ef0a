package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q1_pricing groups to the 6 returnflag/linestatus cells") {
    val df = Relational.q1Pricing(spark, sf).cache()
    assert(df.count() == 6)
    assert(df.columns.toSet == Set("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc", "count_order"))
    val totalLines = df.agg(sum("count_order")).head.getLong(0)
    val rawLines = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp")).count()
    assert(totalLines == rawLines)
  }

  test("q2_filter_agg returns one row with positive revenue") {
    val row = Relational.q2FilterAgg(spark, sf).head
    assert(row.getDouble(row.fieldIndex("revenue")) > 0)
    assert(row.getLong(row.fieldIndex("n_items")) > 0)
  }

  test("q3_join5 covers every nation and keeps line totals") {
    val df = Relational.q3Join5(spark, sf).cache()
    assert(df.count() == 25) // all 25 nations, grouped under 5 regions
    assert(df.agg(sum("n_lines")).head.getLong(0) ==
      Tables.lineitem(spark, sf).count()) // every line joins somewhere
  }

  test("q4_exists counts only orders having a returned line") {
    val df = Relational.q4Exists(spark, sf)
    val total = df.agg(sum("order_count")).head.getLong(0)
    assert(total > 0 && total < Tables.orders(spark, sf).count())
  }

  test("q5_window keeps at most 3 orders per customer, ranked") {
    val df = Relational.q5Window(spark, sf).cache()
    assert(df.groupBy("o_custkey").count().agg(max("count")).head.getLong(0) <= 3)
    assert(df.agg(max("rnk")).head.getInt(0) <= 3)
  }

  test("q6_rollup grand-total row equals orders count") {
    val df = Relational.q6Rollup(spark, sf)
    val grand = df.filter(col("o_orderstatus").isNull && col("o_orderpriority").isNull)
      .head.getAs[Long]("n_orders")
    assert(grand == Tables.orders(spark, sf).count())
  }

  test("q7_topk_per_group has 3 users per event type, descending") {
    val df = Relational.q7TopkPerGroup(spark, sf).cache()
    assert(df.groupBy("event_type").count().agg(max("count")).head.getLong(0) <= 3)
    // rank 1 has the max total per group
    val r = df.filter(col("event_type") === "click").orderBy("rnk")
      .select("total_value").collect().map(_.getDouble(0))
    assert(r.sameElements(r.sorted(Ordering[Double].reverse)))
  }

  test("e1_events_window partitions all events into hour buckets") {
    val df = Relational.e1EventsWindow(spark, sf)
    assert(df.agg(sum("n_events")).head.getLong(0) ==
      Tables.events(spark, sf).count())
  }
}
