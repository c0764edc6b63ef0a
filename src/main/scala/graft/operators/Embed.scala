package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text→vector embedder (SURVEY §2.2 v0_embed).
  *
  * Stands in for the reference's SentenceTransformer MiniLM model
  * (/root/reference/src/db.py:127-129) — model weights can't ship here,
  * so this is a hashing-TF projection: token → polynomial-rolling-hash →
  * bucket in [0, dim), bucket counts L2-normalized. Entirely Catalyst
  * higher-order functions (no UDF), and the hash arithmetic is portable
  * integer math so the DuckDB oracle reproduces it bit-for-bit.
  */
object Embed {

  val HashMod = 1000000007L

  /** Polynomial rolling hash of a token: fold h = (h*31 + codepoint) mod p. */
  def tokenHash(t: Column): Column =
    aggregate(
      sequence(lit(1), length(t)),
      lit(0L),
      (h, i) => (h * lit(31L) + ascii(t.substr(i, lit(1)))) % lit(HashMod))

  /** Whitespace tokens, empties dropped. */
  def tokens(textCol: Column): Column =
    filter(split(textCol, " "), t => length(t) > lit(0))

  /** L2-normalized hashing-TF embedding as array<double>, elements
    * rounded to 6 dp (rounding AFTER normalization, both engines).
    */
  def embedding(textCol: Column, dim: Int): Column = {
    val buckets = transform(tokens(textCol), t => tokenHash(t) % lit(dim.toLong))
    val counts = transform(
      sequence(lit(0), lit(dim - 1)),
      b => size(filter(buckets, x => x === b)).cast("double"))
    val nrm = sqrt(aggregate(counts, lit(0.0), (acc, x) => acc + x * x))
    transform(counts, x => round(x / nrm, 6))
  }
}
