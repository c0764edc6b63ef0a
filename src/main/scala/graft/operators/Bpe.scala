package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning (SURVEY §2.5 bpe1) —
  * the tokenizer-training step of an LLM data pipeline: iteratively
  * find the most frequent adjacent symbol pair (weighted by word
  * frequency) and fuse it, emitting the ranked merge table that a
  * tokenizer ships as `merges.txt`.
  *
  * Scale shape: the corpus collapses to a (word, freq) table first —
  * ONE corpus-sized aggregation; every later round works on distinct
  * words only (Zipf: orders of magnitude smaller, and the standard
  * trick every BPE trainer uses). Per round: adjacent pairs explode
  * from the symbol arrays (the explode wraps the construction
  * directly), one map-side-combined sum picks the global argmax pair
  * (ties broken lexicographically for determinism), and the merge
  * itself is a map-only fold over each word's symbols — no shuffle.
  * Rounds localCheckpoint like connectedComponents (iterative lineage
  * otherwise snowballs). The argmax collect is one row per round —
  * driver traffic is merge-table-sized, never corpus-sized.
  *
  * Driver check is rows-only (an iterative argmax isn't
  * SQL-expressible — same policy as v8's k-means); BpeSpec replays the
  * reference algorithm (single-threaded fold) on the same corpus and
  * asserts the merge tables are IDENTICAL.
  */
object Bpe {

  /** Greedy left-to-right in-word merge of the pair (l, r): classic
    * BPE semantics — overlapping occurrences resolve leftmost-first
    * ("aaa" + (a,a) → ["aa","a"]), and only exact (l, r) adjacency
    * fuses this round. */
  private def mergeExpr(syms: org.apache.spark.sql.Column,
                        l: String, r: String) =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Learn `nMerges` merges from the corpus. Returns the merge table
    * (rank, left, right, pair_freq) with rank 1 = first merge. */
  def learnMerges(docs: DataFrame, textCol: String,
                  nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val chars = transform(
      sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1)))
    var words = graft.Dist.spread(docs)
      .select(explode(Embed.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), chars.as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val top = words
        .select(col("freq"), explode(when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum("freq").as("pf"))
        .orderBy(col("pf").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, pf) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, pf))
        words = words
          .select(col("freq"), mergeExpr(col("syms"), l, r).as("syms"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.result().toDF("rank", "left", "right", "pair_freq")
  }

  /** Greedy leftmost-first fuse of one merge inside a symbol array —
    * the imperative twin of `mergeExpr` (spec-checked identical). */
  private[operators] def fuse(syms: Array[String], l: String,
                              r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { s =>
      if (out.nonEmpty && out.last == l && s == r)
        out(out.length - 1) = l + r
      else out += s
    }
    out.toArray
  }

  /** bpe2: apply a learned merge table to tokenize the corpus — each
    * word starts as its character symbols and every merge is applied
    * in rank order, greedy leftmost-first, exactly replaying training
    * (so encoding the training corpus reproduces the trainer's
    * end-state symbol counts). Map-only at any scale: the merge table
    * broadcasts (it is merges.txt-sized), each partition encodes
    * imperatively — the batched-inference shape, with the merge ranks
    * as the "model" — and nothing shuffles until the per-doc output
    * row. Emits (doc_id, n_tokens, n_symbols, compression) where
    * compression = round(chars/symbols, 4).
    */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val rows = docs
      .select(col("doc_id"), Embed.tokens(col(textCol)).as("tk"))
      .rdd.mapPartitions { it =>
        val ms = bc.value
        it.map { row =>
          val tks = row.getSeq[String](1)
          var nSym = 0L
          var nChar = 0L
          tks.foreach { w =>
            var syms = w.map(_.toString).toArray
            nChar += syms.length
            ms.foreach { case (l, r) => syms = fuse(syms, l, r) }
            nSym += syms.length
          }
          org.apache.spark.sql.Row(row.getLong(0), tks.length.toLong, nSym,
            if (nSym == 0) 0.0
            else math.floor(nChar.toDouble / nSym * 10000.0 + 0.5) / 10000.0)
        }
      }
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_symbols",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("compression",
        org.apache.spark.sql.types.DoubleType, nullable = false))))
  }
}
