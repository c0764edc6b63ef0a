package graft

import graft.operators.{Dedup, VectorSearch}
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r12 N-adaptive machinery: the width schedule, slice-stable
  * plane generation, the per-layer HNSW width derivation, the finer
  * simhash pigeonhole, and the sampled brute-force attestation slice.
  * These are the rules both ENGINES must agree on (the oracle
  * recomputes each from count(*) / shared literals), so the unit pins
  * live here and the cross-engine pins live in the rung gates.
  */
class AdaptiveWidthSpec extends AnyFunSuite {

  test("pairBits: min b in [6,24] with N <= 32*2^b, clamped at 24") {
    assert(VectorQueries.pairBits(0) === 6)
    assert(VectorQueries.pairBits(500) === 6)
    assert(VectorQueries.pairBits(2048) === 6)   // sf0.1 boundary: 32<<6
    assert(VectorQueries.pairBits(2049) === 7)
    assert(VectorQueries.pairBits(20000) === 10) // sf1
    assert(VectorQueries.pairBits(200000) === 13) // sf10
    assert(VectorQueries.pairBits(600000) === 15) // sf30
    assert(VectorQueries.pairBits(2097152) === 16) // former cap: now mid-schedule
    assert(VectorQueries.pairBits(2097153) === 17) // r12 cap lift: no clamp at 2M
    assert(VectorQueries.pairBits(32L << 24) === 24) // schedule end: 536M vectors
    assert(VectorQueries.pairBits(Long.MaxValue) === 24) // clamped (ix3 flags this)
  }

  test("past the schedule the clamp is FLAGGED, not silent (ix3 rule)") {
    // the ix3_width_preflight row derives (bits, clamped) from the
    // same comparison both engines run; pin the pure rule here
    def clamped(n: Long): Boolean = {
      val b = VectorQueries.pairBits(n)
      n > (VectorQueries.PairOcc.toLong << b)
    }
    assert(!clamped(2048))
    assert(!clamped(2097153))          // widens instead of clamping
    assert(!clamped(32L << 24))        // exactly at schedule end
    assert(clamped((32L << 24) + 1))   // past it: flag fires
  }

  test("probe masks: direct combination enumeration, no 2^bits scan") {
    assert(VectorSearch.probeMasks(24, 0) === Seq(0L))
    val r1 = VectorSearch.probeMasks(24, 1)
    assert(r1.size === 25 && r1.distinct.size === 25)
    assert(r1.tail.forall(m => java.lang.Long.bitCount(m) === 1))
    val r2 = VectorSearch.probeMasks(10, 2)
    assert(r2.size === 1 + 10 + 45 && r2.distinct.size === r2.size)
    assert(r2.forall(m => java.lang.Long.bitCount(m) <= 2))
    assert(r2.forall(m => m < (1L << 10)))
  }

  test("pair planes are slice-stable: first 6 bits are r11's arrays") {
    val ext = VectorQueries.rpWeightsPairExt
    val legacy = VectorQueries.rpWeightsPair
    for (t <- ext.indices; b <- 0 until VectorQueries.RpBitsPair)
      assert(ext(t)(b).sameElements(legacy(t)(b)),
        s"plane ($t,$b) diverged from the legacy 6-bit array")
    // pairWeights(b) is a prefix slice, so widening the chosen width
    // never changes the low bits of any bucket id
    val w10 = VectorQueries.pairWeights(10)
    val w13 = VectorQueries.pairWeights(13)
    for (t <- w10.indices; b <- 0 until 10)
      assert(w10(t)(b).sameElements(w13(t)(b)))
    // extended planes are ±1 and deterministic
    assert(ext.forall(_.forall(_.forall(x => x == 1.0 || x == -1.0))))
  }

  test("hnsw per-layer widths: thin 4x, coarsen 4x, legacy at B=6") {
    assert(VectorQueries.hnswBitsFor(6).sameElements(Array(6, 4, 2, 0)))
    assert(VectorQueries.hnswTablesFor(Array(6, 4, 2, 0))
      .sameElements(Array(8, 8, 8, 1)))
    assert(VectorQueries.hnswBitsFor(13).sameElements(Array(13, 11, 9, 7)))
    assert(VectorQueries.hnswTablesFor(Array(13, 11, 9, 7))
      .sameElements(Array(8, 8, 8, 8)))
    // occupancy invariance: N_l / 2^bits_l constant while bits_l > 0
    val bits = VectorQueries.hnswBitsFor(13)
    val occ = bits.zipWithIndex.collect { case (b, l) if b > 0 =>
      200000.0 / math.pow(4, l) / (1L << b) }
    assert(occ.forall(o => math.abs(o - occ.head) < 1e-9))
  }

  test("simhash combo masks: C(10,2)=45 disjoint-exclusion keep-masks") {
    val masks = Dedup.simhashComboMasks(2)
    assert(masks.size === 45)
    assert(masks.distinct.size === 45)
    val full = (1L << (Dedup.SimhashBlocks * Dedup.SimhashBlockBits)) - 1
    // each mask zeroes exactly 2 blocks (12 bits) of the 60
    assert(masks.forall(m => java.lang.Long.bitCount(m) === 48))
    assert(masks.forall(m => (m & ~full) === 0L))
    // completeness: any <=2 differing bits fall in <=2 blocks, so some
    // mask keeps every differing bit OUT — exhaustively check all
    // 1- and 2-bit difference patterns
    val bitsOf = (0 until Dedup.SimhashBits).map(1L << _)
    for (i <- bitsOf.indices; j <- i until bitsOf.size) {
      val diff = bitsOf(i) | bitsOf(j)
      assert(masks.exists(m => (m & diff) === 0L),
        s"difference bits ($i,$j) not covered by any combo mask")
    }
  }

  test("sampled near-dup slice == full pairs filtered to the sample") {
    val s = SparkSpec.session
    import s.implicits._
    val n = 60
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(4)(d => math.sin(i * 2.7 + d).toFloat.toDouble))
    }.toDF("vec_id", "v")
    val mod = 7
    val full = VectorSearch.nearDupPairs(vecs, 0.2)
      .filter(col("id_a") % mod === 0 || col("id_b") % mod === 0)
      .orderBy("id_a", "id_b").collect().toSeq
    val sampled = VectorSearch.nearDupPairsSampled(vecs, 0.2, mod)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(sampled.nonEmpty)
    assert(sampled.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      === full.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
  }

  test("adaptive-width pair generation stays exact vs brute force") {
    // at B=8 (n=8000 would choose it; force via pairWeights) the
    // bucket join must still only MISS pairs, never invent or
    // mis-score them: every emitted pair matches brute-force cosine
    val s = SparkSpec.session
    import s.implicits._
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(64)(d => math.cos(i * 1.3 + d * 0.7)))
    }.toDF("vec_id", "v")
    val w = VectorQueries.pairWeights(8)
    val lsh = VectorSearch.nearDupPairsLshRp(vecs, 0.5, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = VectorSearch.nearDupPairs(vecs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty)
    lsh.foreach { case (k, sc) =>
      assert(brute.contains(k), s"LSH invented pair $k")
      assert(math.abs(brute(k) - sc) < 1e-9, s"score mismatch at $k")
    }
  }
}
