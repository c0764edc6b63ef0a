package graft.operators

import org.apache.spark.sql.Dataset

/** Batched model-inference operator for TEXT embeddings (SURVEY §2.2).
  *
  * The reference embeds with a real model in batches
  * (`SentenceTransformer.encode(texts, batch_size=...)`,
  * /root/reference/src/db.py:127-130). Model weights can't ship here,
  * so the model is a STUB — but the operator shape is the production
  * one, mirroring MultiModal: `mapPartitions` with the model
  * initialized ONCE per partition (that's the expensive weight load)
  * and rows encoded in size-`batchSize` groups (that's the GPU/BLAS
  * batch). Swapping in a real encoder changes only `StubModel.encode`.
  *
  * The stub reproduces Embed.embedDocs' hashing-TF arithmetic
  * bit-for-bit (same polynomial hash, same fold order, same HALF_UP
  * 6-dp rounding on the shortest decimal representation — Spark's own
  * `round` semantics), so the imperative inference path is verified
  * against both the declarative Catalyst path and the DuckDB oracle.
  */
object TextInference {

  case class DocRow(doc_id: Long, text: String)
  case class EmbRow(doc_id: Long, embedding: Array[Double])

  /** The pluggable-encoder seam (the SentenceTransformer contract,
    * db.py:127-130): one batch of texts in, one optional vector per
    * text out (None = un-encodable, dropped). Implementations are
    * constructed ON THE EXECUTOR once per partition via the factory
    * passed to embedText — that is where a real deployment loads
    * model weights/sessions; the trait itself must not capture them
    * (only the factory closure is serialized). */
  trait TextEncoder {
    def encode(batch: Seq[String]): Seq[Option[Array[Double]]]
  }

  /** Per-partition stub "model" (the default encoder). A real
    * deployment holds weights/sessions here; construction cost is
    * amortized over the partition.
    * Token-less (or null) texts encode to None — the declarative path
    * drops them too (explode of an empty token array emits no rows),
    * and BigDecimal.valueOf(0/0 = NaN) would otherwise throw. */
  final class StubModel(dim: Int) extends TextEncoder {
    def encode(batch: Seq[String]): Seq[Option[Array[Double]]] = batch.map { text =>
      val counts = new Array[Double](dim)
      var nTokens = 0
      Option(text).getOrElse("").split(" ").iterator.filter(_.nonEmpty).foreach { t =>
        val b = (graft.functions.PolyHash.hash(t,
          graft.functions.PolyHash.Base, graft.functions.PolyHash.Mod) % dim).toInt
        counts(b) += 1.0
        nTokens += 1
      }
      if (nTokens == 0) None
      else {
        // same sequential fold order as the Catalyst aggregate()
        var sq = 0.0
        var i = 0
        while (i < dim) { sq += counts(i) * counts(i); i += 1 }
        val nrm = math.sqrt(sq)
        Some(Array.tabulate(dim) { j =>
          // Spark round(): HALF_UP on BigDecimal.valueOf (shortest repr)
          java.math.BigDecimal.valueOf(counts(j) / nrm)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        })
      }
    }
  }

  /** Batched embedding inference: encoder built once per partition
    * from `mkEncoder` (the weight-load site), texts encoded in
    * `batchSize` groups. Docs the encoder returns None for are
    * dropped (parity with Embed.embedDocs). Swapping in a real model
    * is ONLY a different factory — the plumbing (schema, batching,
    * per-partition init) is this function and does not change. */
  def embedText(docs: Dataset[DocRow], dim: Int, batchSize: Int = 64,
                mkEncoder: Int => TextEncoder = new StubModel(_)): Dataset[EmbRow] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { rows =>
      val model = mkEncoder(dim) // per-partition weight load
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = model.encode(batch.map(_.text))
        batch.lazyZip(vecs).flatMap((r, v) => v.map(EmbRow(r.doc_id, _)))
      }
    }
  }
}
