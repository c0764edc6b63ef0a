package graft

import graft.queries.VectorQueries
import graft.operators.VectorSearch
import org.apache.spark.sql.functions._

/** Documented recall bounds for the hyperplane LSH (SURVEY §2.3 v7 /
  * §2.4 d6). Fully deterministic: fixed weights (seed 42), fixed
  * fixture — these are measurements pinned as floors, not flaky
  * statistical tests.
  */
class LshRecallSpec extends SparkSpec {

  test("v7 hyperplane LSH top-5 recall vs brute force >= 0.6 on the fixture") {
    val brute = VectorQueries.v1KnnCos(spark, sf).select("query_id", "vec_id").cache()
    val lsh = VectorQueries.v7KnnLsh(spark, sf).select("query_id", "vec_id")
    val recall = lsh.intersect(brute).count().toDouble / brute.count()
    assert(recall >= 0.6, f"v7 recall $recall%.3f (measured 0.675 at pinning)")
  }

  test("v13 multi-probe recall beats single-probe v7 and >= 0.8") {
    val brute = VectorQueries.v1KnnCos(spark, sf).select("query_id", "vec_id").cache()
    val v7 = VectorQueries.v7KnnLsh(spark, sf).select("query_id", "vec_id")
    val v13 = VectorQueries.v13KnnLshMp(spark, sf).select("query_id", "vec_id")
    val n = brute.count().toDouble
    val r7 = v7.intersect(brute).count() / n
    val r13 = v13.intersect(brute).count() / n
    // probing hamming-1 buckets strictly widens the candidate set
    assert(r13 >= r7, f"multi-probe $r13%.3f < single-probe $r7%.3f")
    assert(r13 >= 0.8, f"v13 recall $r13%.3f (measured 0.975 at pinning)")
  }

  test("d6 hyperplane pair recall vs exact d5 >= 0.35 on the fixture") {
    // d6 runs 6-bit tables (see VectorQueries.RpBitsPair): the pair
    // join's candidate volume is N²·L/2^(b+1), so coarse 4-bit buckets
    // degenerate toward all-pairs cost. 0.394 measured at the loose
    // cos≥0.4 fixture threshold; the true near-dup regime the operator
    // targets (cos≥0.95) recalls ≥0.9 — next test.
    val d5 = VectorQueries.d5EmbedNearDup(spark, sf).select("id_a", "id_b").cache()
    val d6 = VectorQueries.d6NearDupLsh(spark, sf).select("id_a", "id_b")
    val recall = d6.intersect(d5).count().toDouble / math.max(1, d5.count())
    assert(recall >= 0.35, f"d6 pair recall $recall%.3f (measured 0.394 at pinning)")
  }

  test("d10 multi-probe pair recall beats single-probe d6") {
    val d5 = VectorQueries.d5EmbedNearDup(spark, sf).select("id_a", "id_b").cache()
    val d6 = VectorQueries.d6NearDupLsh(spark, sf).select("id_a", "id_b")
    val d10 = VectorQueries.d10NearDupLshMp(spark, sf).select("id_a", "id_b")
    val n = math.max(1, d5.count()).toDouble
    val r6 = d6.intersect(d5).count() / n
    val r10 = d10.intersect(d5).count() / n
    assert(r10 >= r6, f"multi-probe pair recall $r10%.3f < single-probe $r6%.3f")
    assert(r10 >= 0.6, f"d10 pair recall $r10%.3f (measured 0.894 vs d6 0.394 at pinning)")
  }

  test("true near-duplicates (cos >= 0.95) are recalled near-perfectly") {
    import spark.implicits._
    // high-similarity pairs are the dedup use case: per-bit agreement
    // p ~ 1 - theta/pi ~ 0.93, so even 8-bit tables catch them
    def gen(id: Int): Array[Double] = Array.tabulate(64) { j =>
      val s = if (((id * 131 + j * 29 + 11) % 89) % 2 == 0) 1.0 else -1.0
      s * (1.0 + 0.01 * ((id + j) % 7))
    }
    val n = 50
    val base = (0 until n).map(i => (i.toLong, gen(i)))
    val dups = (0 until n).map { i =>
      val v = gen(i)
      v(7) = v(7) * 0.5 // small magnitude change, cosine stays > 0.95
      (i.toLong + 1000, v)
    }
    val vecs = (base ++ dups).toDF("vec_id", "v")
    val w = VectorSearch.hyperplaneWeights(8, 8, 64, 42L)
    val found = VectorSearch.nearDupPairsLshRp(vecs, 0.95, w)
      .filter(col("id_b") === col("id_a") + 1000).count()
    assert(found >= (n * 0.9).toInt,
      s"only $found/$n planted near-dup pairs recalled")
  }
}
