package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  /** Reference BPE: single-threaded replay of the classic algorithm
    * (word-frequency table, argmax adjacent pair, greedy leftmost
    * in-word merge) — the ground truth the distributed operator must
    * reproduce exactly. */
  private def referenceBpe(words: Map[String, Long],
                           n: Int): Seq[(Int, String, String, Long)] = {
    var syms: Map[Vector[String], Long] =
      words.groupBy(_._1.toVector.map(_.toString))
        .map { case (k, vs) => k -> vs.values.sum }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to n) {
      val pairCounts = syms.toSeq.flatMap { case (s, f) =>
        s.zip(s.drop(1)).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.nonEmpty) {
        val ((l, r), pf) = pairCounts.minBy { case ((l, r), pf) => (-pf, l, r) }
        out += ((rank, l, r, pf))
        syms = syms.toSeq.map { case (s, f) =>
          val merged = s.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          }
          merged -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.result()
  }

  test("distributed BPE merges equal the reference algorithm exactly") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val got = Bpe.learnMerges(docs, "text", 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
    val wordFreqs = docs
      .select(explode(graft.operators.Embed.tokens(col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = referenceBpe(wordFreqs, 8)
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
    assert(got.size == 8)
    // pair frequencies are non-increasing ONLY per fresh counts — but
    // each merge must have positive support
    assert(got.forall(_._4 > 0))
  }

  test("bpe2 encode replays training: corpus symbol totals match the trainer end state") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", 8)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encode(docs, "text", merges)
    // single-threaded replay over the raw word list per doc
    val expect = docs.select(col("doc_id"),
        explode(graft.operators.Embed.tokens(col("text"))).as("w"))
      .collect().groupBy(_.getLong(0)).view.mapValues { rows =>
        rows.map { r =>
          var syms = r.getString(1).toVector.map(_.toString)
          merges.foreach { case (l, rr) =>
            syms = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == l && x == rr)
                acc.init :+ (l + rr)
              else acc :+ x
            }
          }
          syms.length.toLong
        }.sum
      }.toMap
    val got = enc.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
    // merges actually compress: total symbols < total characters
    val totalChars = docs.select(
      sum(length(regexp_replace(col("text"), " ", ""))).as("n"))
      .head().getLong(0)
    assert(got.values.sum < totalChars)
  }

  test("bpe2 encode: greedy leftmost + rank order on a hand example") {
    import spark.implicits._
    val docs = Seq((1L, "aaab ab")).toDF("doc_id", "text")
    // merges: (a,a) then (aa,a) then (a,b)
    val enc = Bpe.encode(docs, "text",
      Seq(("a", "a"), ("aa", "a"), ("a", "b"))).head()
    // "aaab": [a,a,a,b] -(a,a)-> [aa,a,b] -(aa,a)-> [aaa,b] : 2 syms
    // "ab":   [a,b]     -(a,b)->  [ab]                      : 1 sym
    assert(enc.getLong(1) == 2L, "n_tokens")
    assert(enc.getLong(2) == 3L, "n_symbols")
    assert(enc.getDouble(3) == 2.0, "compression 6 chars / 3 symbols")
  }

  test("overlapping pair merges resolve leftmost-first (aaa -> [aa, a])") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // round 1: pair (a,a) freq 2·2=4 (two occurrences per "aaa"? no —
    // greedy counting sees pairs (1,2) and (2,3): freq 2 words × 2 = 4)
    assert(merges(0) == (1, "a", "a", 4L))
    // after merging: ["aa","a"] — round 2 fuses (aa, a)
    assert(merges(1) == (2, "aa", "a", 2L))
  }
}
