package graft

import graft.functions.Vec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  test("native dot product is bit-identical to the HOF fold") {
    val e = Tables.embeddings(spark, sf)
    val a = e.select(col("vec_id"), col("embedding").as("va"))
    val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("vb"))
    val both = a.join(b, "vec_id")
      .select(Vec.dot(col("va"), col("vb")).as("native"),
              Vec.dotHof(col("va"), col("vb")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("native dot product handles double arrays and null semantics") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),   // 32.0
      (Seq(1.0), Seq(2.0, 3.0))                    // length mismatch -> null
    ).toDF("a", "b")
    val out = df.select(Vec.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
  }

  test("native polyhash is identical to the HOF fold over real corpus tokens") {
    val session = spark
    import session.implicits._
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
    val both = toks.select(
      graft.functions.PolyHash(col("t")).as("native"),
      graft.operators.Embed.tokenHashHof(col("t")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // empty string and null behavior
    val edge = Seq(Some(""), None).toDF("t")
      .select(graft.functions.PolyHash(col("t")).as("h")).collect()
    assert(edge(0).getLong(0) == 0L && edge(1).isNullAt(0))
  }

  test("native dot product participates in codegen plans") {
    val e = Tables.embeddings(spark, sf).limit(10)
    val plan = e.select(Vec.dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot_product"))
  }
}
