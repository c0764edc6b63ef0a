package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LM training (SURVEY §2.5 ch2) — the
  * concat-and-split step of GPT-style pretraining: documents are laid
  * end to end in a deterministic pseudo-random order and the token
  * stream is cut into fixed-`capacity` bins; a document spanning a cut
  * contributes a segment to each bin it crosses.
  *
  * Scale shape: the only global computation is the running token
  * total, done with Dist.runningTotal's two-phase scan (per-partition
  * windows + driver prefix over ≤ #partitions totals) — never a
  * partitionless window. Bin membership is then pure per-row
  * arithmetic + a bounded explode (a doc spans ≤ n_tokens/capacity + 1
  * bins). Deterministic: the order is (mixedHash(id), id), the same
  * portable order the s2 shuffle uses, so every engine and every run
  * packs identically.
  */
object Packing {

  /** docs: (doc_id, n_tokens). Emits one row per (doc, bin) segment:
    * bin id, tokens the doc contributes to that bin, and the doc's
    * start offset within the bin. Bins are `capacity` tokens; every
    * bin except the last is exactly full by construction. */
  def pack(docs: DataFrame, capacity: Int): DataFrame = {
    require(capacity > 0, s"pack capacity must be positive: $capacity")
    val ordered = docs.select(col("doc_id"), col("n_tokens"),
      Sampling.mixedHash(col("doc_id")).as("__hk"))
    val ends = graft.Dist.runningTotal(ordered,
      Seq(col("__hk"), col("doc_id")), "n_tokens")
      .withColumn("__start", col("n_tokens_end") - col("n_tokens"))
    ends.filter(col("n_tokens") > 0)
      .withColumn("bin", explode(sequence(
        expr(s"__start DIV $capacity"),
        expr(s"(n_tokens_end - 1) DIV $capacity"))))
      .withColumn("seg_tokens",
        least(col("n_tokens_end"), (col("bin") + 1) * capacity)
          - greatest(col("__start"), col("bin") * capacity))
      .withColumn("offset_in_bin",
        greatest(col("__start"), col("bin") * capacity) - col("bin") * capacity)
      .select("doc_id", "bin", "seg_tokens", "offset_in_bin")
  }
}
