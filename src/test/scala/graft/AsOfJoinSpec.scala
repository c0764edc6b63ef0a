package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("as-of join picks the latest right row at or before each left time") {
    val session = spark
    import session.implicits._
    val left = Seq(
      (1L, ts(100), "p1"), (1L, ts(200), "p2"), (2L, ts(50), "p3"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(90), 901L), (1L, ts(100), 902L), (1L, ts(150), 903L),
      (2L, ts(60), 904L)) // after left's only row for user 2
      .toDF("user_id", "cts", "click_id")
    val out = AsOfJoin.leftAsOf(left, right, "user_id", "ts", "cts", Seq("click_id"))
      .orderBy("user_id", "ts").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("click_id") == 902L) // equal time counts (<=)
    assert(out(1).getAs[Long]("click_id") == 903L) // latest preceding
    assert(out(2).isNullAt(out(2).fieldIndex("click_id"))) // none before
  }

  test("forward as-of picks the EARLIEST right row at-or-after each left row") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "p1"), (1L, ts(200), "p2"), (2L, ts(70), "p3"))
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(100), 901L), (1L, ts(150), 902L), (1L, ts(250), 903L),
      (2L, ts(60), 904L)) // before left's only row for user 2
      .toDF("user_id", "cts", "click_id")
    val out = AsOfJoin.leftAsOf(left, right, "user_id", "ts", "cts",
        Seq("click_id"), forward = true)
      .orderBy("user_id", "ts").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("click_id") == 901L) // equal time counts (>=)
    assert(out(1).getAs[Long]("click_id") == 903L) // earliest following
    assert(out(2).isNullAt(out(2).fieldIndex("click_id"))) // none after
  }

  test("sk1 skew profile: ranked by load, shares and multiples consistent") {
    val rows = graft.queries.Relational.sk1SkewProfile(spark, sf)
      .orderBy("rank").collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getAs[Long]("n_events"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Double]("share")).sum < 1.0)
    // the hottest key carries at least the average key load
    assert(rows.head.getAs[Double]("x_avg") >= 1.0)
  }

  test("a1_asof plan has exactly one shuffle (union-carry-forward, not theta join)") {
    val plan = graft.queries.Relational.a1Asof(spark, sf)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, s"expected union+window shuffle only, got $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
}
