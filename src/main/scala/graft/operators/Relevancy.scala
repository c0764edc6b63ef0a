package graft.operators

import org.apache.spark.sql.Dataset

/** Batched LLM-judge relevancy scoring (SURVEY §2.6).
  *
  * The reference scores each (query, result) pair with an LLM on a 1-5
  * scale and thresholds relevance at ≥4
  * (/root/reference/src/queries.py:24-29,160-240). An LLM can't ship
  * here, so the JUDGE is a stub — but the operator is the production
  * shape, mirroring TextInference: `mapPartitions` with the scorer
  * constructed ONCE per partition (where a real deployment binds its
  * LLM client / local model) and pairs scored in `batchSize` groups
  * (the request batch). Swapping in a real judge changes only the
  * factory passed to scorePairs.
  */
object Relevancy {

  case class PairRow(id_a: Long, id_b: Long, text_a: String, text_b: String)
  case class ScoreRow(id_a: Long, id_b: Long, relevancy_score: Long,
                      is_relevant: Int)

  /** The pluggable-judge seam: one batch of (text_a, text_b) pairs in,
    * one 1-5 score per pair out. Implementations are constructed on
    * the executor once per partition via the factory passed to
    * scorePairs — only the factory closure is serialized. */
  trait RelevancyScorer {
    def score(batch: Seq[(String, String)]): Seq[Long]
  }

  /** Default deterministic stand-in: distinct-token jaccard mapped to
    * the reference's 1-5 scale with ALL-INTEGER arithmetic —
    * score = min(5, 1 + (10·|∩|) div |∪|), i.e. floor(10·jaccard)
    * computed without a float, so every engine agrees at the band
    * boundaries. Token-less pairs score 1 (nothing shared). */
  final class JaccardScorer extends RelevancyScorer {
    private def toks(s: String): Set[String] =
      Option(s).getOrElse("").split(" ").iterator.filter(_.nonEmpty).toSet
    def score(batch: Seq[(String, String)]): Seq[Long] = batch.map {
      case (a, b) =>
        val (ta, tb) = (toks(a), toks(b))
        val inter = (ta intersect tb).size.toLong
        val uni = (ta union tb).size.toLong
        if (uni == 0) 1L else math.min(5L, 1L + (10L * inter) / uni)
    }
  }

  /** Batched pair scoring through the seam: scorer built once per
    * partition, pairs scored in `batchSize` groups, relevance
    * thresholded at ≥4 (the reference's rule). Map-only at any scale —
    * the expensive part is the judge call, and this shape gives it
    * exactly the batching a GPU/LLM endpoint wants. */
  def scorePairs(pairs: Dataset[PairRow], batchSize: Int = 32,
                 mkScorer: () => RelevancyScorer = () => new JaccardScorer)
  : Dataset[ScoreRow] = {
    import pairs.sparkSession.implicits._
    pairs.mapPartitions { rows =>
      val judge = mkScorer() // per-partition client/model bind
      rows.grouped(batchSize).flatMap { batch =>
        val scores = judge.score(batch.map(r => (r.text_a, r.text_b)))
        batch.lazyZip(scores).map { (r, sc) =>
          ScoreRow(r.id_a, r.id_b, sc, if (sc >= 4) 1 else 0)
        }
      }
    }
  }
}
