package graft

import graft.operators.VectorSearch
import graft.queries.VectorQueries
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

/** The fused HyperplaneBuckets kernel must be bit-identical to the
  * expression-tree formulation it replaced (tables×bits DotProduct
  * nodes) — including the degenerate inputs whose per-bit `when`
  * chains collapse to the all-zero bucket code. Every LSH family
  * (d6/d10/kg1/hg1/hg2/v7/v13/ix2/emh1 and the v19 dense arm) buckets
  * through this kernel, so equality here is what keeps every committed
  * rung hash valid after the swap. */
class HyperplaneBucketsSpec extends SparkSpec {

  private val w = VectorQueries.rpWeightsPair // 8 tables × 6 bits × 64 dims

  test("fused kernel equals the expression tree on real corpus vectors") {
    val e = Tables.embeddings(spark, sf)
    val both = e.select(
      VectorSearch.hyperplaneBuckets(col("embedding"), w).as("fused"),
      VectorSearch.hyperplaneBucketsHof(col("embedding"), w).as("tree"))
    assert(both.filter(not(col("fused") <=> col("tree"))).count() == 0)
    assert(both.count() > 0)
  }

  test("fused kernel equals the tree at the widest adaptive schedule") {
    val wide = VectorQueries.pairWeights(VectorQueries.RpBitsPairMax)
    val e = Tables.embeddings(spark, sf).limit(64)
    val both = e.select(
      VectorSearch.hyperplaneBuckets(col("embedding"), wide).as("fused"),
      VectorSearch.hyperplaneBucketsHof(col("embedding"), wide).as("tree"))
    assert(both.filter(not(col("fused") <=> col("tree"))).count() == 0)
  }

  test("degenerate vectors bucket exactly like the tree (zeros; NaN all-ones)") {
    val session = spark
    import session.implicits._
    val dim = 64
    val good = Seq.tabulate(dim)(i => Some(math.sin(i + 1).toFloat))
    val rows: Seq[(String, Option[Seq[Option[Float]]])] = Seq(
      ("good", Some(good)),
      ("null_vec", None),
      ("short_vec", Some(good.take(10))),
      ("null_elem", Some(good.updated(7, None))),
      // a NaN dot is >= 0.0 under Spark's NaN-above-everything
      // comparison order, so EVERY bit sets: the all-ones code
      ("nan_elem", Some(good.updated(3, Some(Float.NaN)))))
    val df = rows.toDF("name", "v")
    val allOnes = (1L << w.head.length) - 1
    val both = df.select(col("name"),
      VectorSearch.hyperplaneBuckets(col("v"), w).as("fused"),
      VectorSearch.hyperplaneBucketsHof(col("v"), w).as("tree"))
    both.collect().foreach { r =>
      val fused = r.getSeq[Long](1)
      val tree = r.getSeq[Long](2)
      assert(fused == tree, s"row ${r.getString(0)}")
      r.getString(0) match {
        case "good"     => assert(fused.exists(_ != 0L))
        case "nan_elem" => assert(fused.forall(_ == allOnes))
        case name       => assert(fused.forall(_ == 0L), s"row $name not all-zero")
      }
    }
  }

  test("double-array inputs take the non-cast read path and still match") {
    val e = Tables.embeddings(spark, sf).limit(32)
      .select(col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      VectorSearch.hyperplaneBuckets(col("v"), w).as("fused"),
      VectorSearch.hyperplaneBucketsHof(col("v"), w).as("tree"))
    assert(both.filter(not(col("fused") <=> col("tree"))).count() == 0)
  }

  test("interpreted eval matches the codegen path") {
    // collect() above exercises codegen; here drive Expression.eval
    // directly against the same vectors
    val vecs = Tables.embeddings(spark, sf).limit(16)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val expected = Tables.embeddings(spark, sf).limit(16)
      .select(VectorSearch.hyperplaneBuckets(col("embedding"), w).as("b"))
      .collect().map(_.getSeq[Long](0))
    val litExpr = vecs.map { v =>
      val c = typedLit(v.toSeq)
      graft.functions.HyperplaneBuckets(
        GraftBridge.eagerExpression(c),
        w.flatten.flatten.toIndexedSeq, w.length, w.head.length, 64)
    }
    litExpr.zip(expected).foreach { case (ex, want) =>
      val got = ex.eval(InternalRow.empty)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      assert(got == want)
    }
  }

  test("the kernel keeps the bucket scan inside whole-stage codegen") {
    val plan = Tables.embeddings(spark, sf)
      .select(VectorSearch.hyperplaneBuckets(col("embedding"), w).as("b"))
      .queryExecution.executedPlan.toString
    // the executedPlan string marks codegen'd operators with the
    // `*(stageId)` prefix
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project .*graft_hyperplane_buckets.*"),
      plan.take(500))
  }
}
