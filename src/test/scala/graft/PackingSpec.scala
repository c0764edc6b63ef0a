package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("every bin except the last is exactly full; totals are conserved") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      size(graft.operators.Embed.tokens(col("text"))).as("n_tokens"))
    val packed = Packing.pack(docs, 256).cache()
    val bins = packed.groupBy("bin").agg(sum("seg_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastBin = bins.keys.max
    bins.foreach { case (b, t) =>
      if (b < lastBin) assert(t == 256L, s"bin $b has $t tokens, want 256")
      else assert(t <= 256L && t > 0L, s"last bin has $t")
    }
    // conservation: packed segments sum to the corpus token count
    val total = docs.agg(sum("n_tokens")).head().getLong(0)
    assert(bins.values.sum == total)
    // bins are dense from 0
    assert(bins.keys.min == 0L && bins.size == lastBin + 1)
  }

  test("runningTotal rejects non-integral value columns at plan time") {
    import spark.implicits._
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      Dist.runningTotal(df, Seq(col("id")), "v")
    }
    assert(ex.getMessage.contains("must be integral"))
  }

  test("a doc spanning a cut contributes correct segments to both bins") {
    import spark.implicits._
    // order is by mixedHash: compute it to find the doc layout, then
    // verify segments reconstruct each doc's length with correct offsets
    val docs = Seq((1L, 100), (2L, 100), (3L, 100)).toDF("doc_id", "n_tokens")
    val packed = Packing.pack(docs, 128).cache()
    val perDoc = packed.groupBy("doc_id").agg(sum("seg_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == Map(1L -> 100L, 2L -> 100L, 3L -> 100L))
    // 300 tokens at capacity 128 -> bins 0,1 full, bin 2 has 44
    val bins = packed.groupBy("bin").agg(sum("seg_tokens").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins == Map(0L -> 128L, 1L -> 128L, 2L -> 44L))
    // offsets sit inside the bin
    assert(packed.filter(col("offset_in_bin") < 0 ||
      col("offset_in_bin") >= 128).count() == 0L)
  }

  test("zero-token docs are excluded; empty input packs to nothing") {
    import spark.implicits._
    val docs = Seq((1L, 0), (2L, 10)).toDF("doc_id", "n_tokens")
    val packed = Packing.pack(docs, 64).collect()
    assert(packed.map(_.getLong(0)).toSet == Set(2L))
    val empty = Seq.empty[(Long, Int)].toDF("doc_id", "n_tokens")
    assert(Packing.pack(empty, 64).count() == 0L)
  }
}
