package graft

import org.apache.spark.sql.functions._

/** Count-Min sketch heavy hitters (operators.Sketch). */
class SketchSpec extends SparkSpec {
  import graft.operators.Sketch

  private def tokenDf(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("token")
  }

  test("count-min estimate never underestimates any token's true count") {
    // skewed corpus: 'hot' 400×, 'warm' 50×, 100 distinct singletons
    val toks = tokenDf(Seq.fill(400)("hot") ++ Seq.fill(50)("warm") ++
      (1 to 100).map(i => s"cold$i"))
    val sk = Sketch.buildSketch(toks, "token")
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = toks.distinct()
      .select(col("token"), Sketch.estimate(sk, col("token")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"estimate ${est(t)} < true $n for '$t'")
    }
  }

  test("heavy hitters equal the naive HAVING aggregate on a skewed corpus") {
    val toks = tokenDf(Seq.fill(300)("alpha") ++ Seq.fill(120)("beta") ++
      Seq.fill(3)("gamma") ++ (1 to 77).map(i => s"tail$i"))
    val denom = 10L // heavy iff n*10 >= 500 i.e. n >= 50
    val got = Sketch.heavyHitters(toks, "token", denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("alpha" -> 300L, "beta" -> 120L))
  }

  test("sketch prefilter drops the long tail before the exact groupBy") {
    val toks = tokenDf(Seq.fill(500)("hot") ++ (1 to 200).map(i => s"t$i"))
    val sk = Sketch.buildSketch(toks, "token")
    val total = sk(0).sum
    assert(total == 700L)
    // rows surviving the map-side sketch filter at the 10% threshold:
    // all 500 'hot' occurrences must survive; the 200 singletons can
    // only survive via collisions, which the 4-row min makes rare
    val survivors = toks
      .filter(Sketch.estimate(sk, col("token")) * 10L >= total)
    assert(survivors.filter(col("token") === "hot").count() == 500)
    assert(survivors.count() < 600, "sketch filter failed to kill the tail")
  }
}
