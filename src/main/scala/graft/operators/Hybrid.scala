package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval via reciprocal-rank fusion (SURVEY §2.6 v12) — the
  * modern search stack pairs the reference's vector arm
  * (chroma.py:96-106) with a lexical BM25 arm and fuses by rank:
  * RRF(d) = Σ_arms 1 / (k + rank_arm(d)), robust to arms with
  * incomparable score scales (BM25 vs cosine) because only RANKS enter
  * the fusion.
  *
  * Scale shape: each arm is already a bounded top-m rank list (custom
  * TopK operator), so fusion is a union of |queries|·m tiny rows + one
  * (query, doc) aggregation — the arms dominate, fusion is free. Rank
  * arithmetic is exact-integer-derived doubles (1/(k+r)), so the fused
  * scores are bit-identical across engines by construction — no libm
  * anywhere in the fusion.
  */
object Hybrid {

  /** The standard RRF constant (Cormack et al.): dampens the gap
    * between adjacent top ranks so no single arm dominates. */
  val RrfK = 60

  /** Fuse rank lists. Each arm must expose (query_id, doc_id, rnk)
    * with rnk 1-based; a doc absent from an arm contributes 0.
    * `topK` is the OUTPUT cutoff per query — the RRF formula's own
    * constant is [[RrfK]], not this parameter. */
  def rrfFuse(arms: Seq[DataFrame], topK: Int): DataFrame = {
    val contribs = arms.map(_.select(col("query_id"), col("doc_id"),
      (lit(1.0) / (lit(RrfK) + col("rnk"))).as("c")))
    // ≤ one row per (query, doc) per arm → the sum has ≤ |arms| addends;
    // with 2 arms addition is commutative-safe, no rounding ambiguity
    val fused = contribs.reduce(_ unionAll _)
      .groupBy("query_id", "doc_id")
      .agg(round(sum("c"), 6).as("rrf_score"))
    graft.plans.TopK.perKey(fused, Seq("query_id"),
      Seq(col("rrf_score").desc, col("doc_id").asc), topK)
  }
}
