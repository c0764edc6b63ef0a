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

  test("a1_asof plan has exactly one shuffle (union-carry-forward, not theta join)") {
    val plan = graft.queries.Relational.a1Asof(spark, sf)
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 2, s"expected union+window shuffle only, got $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
}
