package graft

import graft.plans.TopK
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {

  private def perUser = Tables.events(spark, sf)
    .groupBy("event_type", "user_id")
    .agg(round(sum("value"), 2).as("total_value"))

  test("native top-k matches the row_number window formulation exactly") {
    val native = TopK.perKey(perUser, Seq("event_type"),
      Seq(col("total_value").desc, col("user_id").asc), 3)
    val window = graft.queries.Relational.q7TopkPerGroup(spark, sf)
    assert(native.count() == window.count())
    assert(native.exceptAll(window).count() == 0)
    assert(window.exceptAll(native).count() == 0)
  }

  test("plan contains the custom partial+merge operators and an exchange between them") {
    val native = TopK.perKey(perUser, Seq("event_type"),
      Seq(col("total_value").desc, col("user_id").asc), 3)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("TopKMergeExec") || plan.contains("TopKMerge"))
    assert(plan.contains("LocalTopK"))
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("rank column is 1-based, dense within each key, capped at k") {
    val native = TopK.perKey(perUser, Seq("event_type"),
      Seq(col("total_value").desc, col("user_id").asc), 3).cache()
    val perKey = native.groupBy("event_type")
      .agg(min("rnk").as("mn"), max("rnk").as("mx"), count(lit(1)).as("n"))
      .collect()
    assert(perKey.forall(r => r.getInt(1) == 1 && r.getInt(2) <= 3
      && r.getInt(2).toLong == r.getLong(3)))
  }

  test("empty keys = global top-k") {
    val native = TopK.perKey(perUser, Seq(),
      Seq(col("total_value").desc, col("user_id").asc), 5)
    val rows = native.orderBy("rnk").collect()
    assert(rows.length == 5)
    val vals = rows.map(_.getAs[Double]("total_value"))
    assert(vals.sameElements(vals.sorted(Ordering[Double].reverse)))
  }

  test("distinct top-k == dedup-then-top-k on a duplicated stream") {
    // simulate the multi-table LSH candidate stream: every row appears
    // once per agreeing table with bit-identical payload
    val dups = perUser.crossJoin(spark.range(3).select(lit(1).as("copy")))
      .drop("copy").repartition(7) // duplicates spread across partitions
    val distinctTopK = TopK.perKey(dups, Seq("event_type"),
      Seq(col("total_value").desc, col("user_id").asc), 4, distinct = true)
    val reference = TopK.perKey(perUser, Seq("event_type"),
      Seq(col("total_value").desc, col("user_id").asc), 4)
    assert(distinctTopK.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(distinctTopK).count() == 0)
    // and WITHOUT distinct the duplicates occupy rank slots (the
    // behavior the flag exists to prevent)
    val plain = TopK.perKey(dups, Seq("event_type"),
      Seq(col("total_value").desc, col("user_id").asc), 4)
    assert(plain.select("event_type", "user_id").distinct().count() <
      plain.count())
  }
}
