package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (SURVEY §2.3 v10): diversify
  * a top-m candidate list down to k results by greedily picking
  * argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s).
  *
  * Scale shape: the expensive part (candidate generation) stays fully
  * distributed (any kNN operator); MMR itself runs per query over its
  * OWN ≤m candidates via mapGroups — per-group state is m vectors
  * (a few KB), the greedy loop is O(k·m) dots, and queries are
  * independent, so the stage parallelizes across queries with no
  * shuffle beyond the groupBy. A window/self-join formulation can't
  * express the sequential dependence on the selected set; a greedy
  * typed fold per small group is the honest distributed design.
  *
  * Not SQL-expressible without recursive CTE gymnastics → rows-only
  * driver check; MmrSpec pins the semantics.
  */
object Mmr {

  case class Cand(query_id: Long, vec_id: Long, score: Double, v: Array[Double])
  case class Picked(query_id: Long, vec_id: Long, score: Double,
                    mmr_score: Double, pick: Int)

  /** candidates: (query_id, vec_id, score, v) — score descending =
    * more relevant. Returns k picks per query with pick order. */
  def rerank(candidates: Dataset[Cand], k: Int, lambda: Double): Dataset[Picked] = {
    import candidates.sparkSession.implicits._
    candidates.groupByKey(_.query_id).flatMapGroups { (qid, it) =>
      val cands = it.toArray.sortBy(c => (-c.score, c.vec_id))
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
      }
      val selected = scala.collection.mutable.ArrayBuffer.empty[Cand]
      val out = scala.collection.mutable.ArrayBuffer.empty[Picked]
      var exhausted = false
      while (!exhausted && selected.length < k && selected.length < cands.length) {
        var best: Cand = null
        var bestScore = Double.NegativeInfinity
        cands.iterator.filterNot(c => selected.exists(_.vec_id == c.vec_id)).foreach { c =>
          val maxSim = if (selected.isEmpty) 0.0
            else selected.iterator.map(s => cos(c.v, s.v)).max
          val m = lambda * c.score - (1 - lambda) * maxSim
          // deterministic tie-break on vec_id
          if (m > bestScore || (m == bestScore && best != null && c.vec_id < best.vec_id)) {
            best = c; bestScore = m
          }
        }
        // every remaining candidate can score NaN (e.g. a zero query
        // vector makes cosine 0/0): stop instead of selecting null
        if (best == null) exhausted = true
        else {
          selected += best
          out += Picked(qid, best.vec_id, best.score, bestScore, selected.length)
        }
      }
      out.iterator
    }
  }

  /** Convenience: run brute-force cosine top-m candidates, then MMR. */
  def diversifiedKnn(queries: DataFrame, corpus: DataFrame,
                     k: Int, m: Int, lambda: Double): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cands = VectorSearch.knnCosine(queries, corpus, m)
      .join(corpus.select(col("vec_id"),
        Vec.normalize(col("v")).as("v")), "vec_id")
      .select(col("query_id"), col("vec_id"), col("score"), col("v"))
      .as[Cand]
    rerank(cands, k, lambda).toDF()
  }
}
