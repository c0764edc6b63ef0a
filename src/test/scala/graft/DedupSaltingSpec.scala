package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Hot-bucket salting in the dedup pair generators (SURVEY §2.4 d2/d3):
  * buckets hotter than the working df cap must still YIELD their pairs
  * (through Dist.saltedJoin, work spread over HotSalts reducers) — only
  * buckets beyond the hard drop cap disappear, and that drop is the
  * oracle-mirrored declared semantics.
  */
class DedupSaltingSpec extends SparkSpec {

  test("a 1000-doc hot shingle still yields all its pairs (salted, not dropped)") {
    val session = spark
    import session.implicits._
    // every doc shares the shingle "alpha beta gamma" (df = 1000, well
    // over DefaultDfCap = 500, under DropDfCap) plus three unique
    // shingles → inter = 1, union = 7 for every pair
    val docs = (0 until 1000)
      .map(i => (i.toLong, s"alpha beta gamma u$i v$i w$i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.05)
    assert(pairs.count() == 1000L * 999 / 2,
      "every pair through the hot shingle must be generated")
    val j = pairs.filter(col("id_a") === 0 && col("id_b") === 1)
      .head().getDouble(2)
    assert(math.abs(j - 0.142857) < 1e-6) // 1/7 rounded to 6dp
  }

  test("salted path is pair-identical to the plain join (d2)") {
    val docs = Tables.documents(spark, sf).limit(80)
    // dfCap = 0 forces EVERY bucket through the salted join; same drop
    // cap → the outputs must match row for row
    val plain = Dedup.ngramJaccardPairs(docs, 3, 0.05).collect().toSet
    val salted = Dedup.ngramJaccardPairs(docs, 3, 0.05, dfCap = 0).collect().toSet
    assert(plain.nonEmpty && salted == plain)
  }

  test("salted path is pair-identical to the plain join (d3 band buckets)") {
    val docs = Tables.documents(spark, sf).limit(80)
    val plain = Dedup.minhashCandidates(docs, 3).collect().toSet
    val salted = Dedup.minhashCandidates(docs, 3, dfCap = 0).collect().toSet
    assert(plain.nonEmpty && salted == plain)
  }

  test("beyond the drop cap the bucket is dropped (declared fallback)") {
    val session = spark
    import session.implicits._
    // the only SHARED shingle has df = 12 > dropCap = 5 → dropped; the
    // remaining per-doc shingles are unique → no pair intersects
    val docs = (0 until 12)
      .map(i => (i.toLong, s"alpha beta gamma x$i y$i z$i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.0001,
      dfCap = 2, dropCap = 5)
    assert(pairs.count() == 0)
    // sanity: with the drop cap lifted the same corpus pairs fully
    assert(Dedup.ngramJaccardPairs(docs, 3, 0.0001,
      dfCap = 2, dropCap = 100).count() == 12L * 11 / 2)
  }
}
