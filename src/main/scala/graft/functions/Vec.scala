package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector column functions over `array<float>` embeddings.
  *
  * Built from `zip_with`/`aggregate` higher-order functions — these stay
  * inside Catalyst (null-safe, whole-stage-codegen-adjacent) instead of
  * deserializing to Scala UDF objects, which matters when the column is
  * scanned 100 TB at a time.
  *
  * All arithmetic is DOUBLE end-to-end: float→double cast is exact, and
  * a sequential double fold is bit-reproducible across engines — the
  * DuckDB oracle (`list_dot_product` on `DOUBLE[]` casts) produces the
  * identical bits, so distances can be compared by hash, not tolerance.
  * (Reference semantics: cosine space per /root/reference/src/chroma.py:80,
  * dot-product scores per /root/reference/src/pineconeDB.py.)
  */
object Vec {

  /** Elementwise product folded sequentially in double — a native
    * codegen'd expression (see DotProduct); identical bits to the
    * equivalent zip_with+aggregate fold at a fraction of the cost. */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** The original higher-order-function formulation, kept as the
    * reference semantics for DotProduct (spec-checked equal). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Euclidean distance via the polarization identity
    * sqrt(|a|² − 2a·b + |b|²) — three dot folds, no intermediate array.
    * Chosen over sqrt(Σ(aᵢ−bᵢ)²) because the oracle can express the
    * exact same operation order, keeping results bit-identical.
    */
  def l2(a: Column, b: Column): Column =
    sqrt(greatest(normSq(a) - lit(2.0) * dot(a, b) + normSq(b), lit(0.0)))

  /** L2-normalized copy of the vector (unit length), still array<double>. */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  /** Per-vector int8 scalar quantization: qᵢ = floor(xᵢ·127/max|x| + 0.5)
    * in [-127, 127] — the standard memory-4×-reduction trick for
    * embedding storage. floor(p + 0.5) instead of round(): floor is
    * bit-exact on identical double products in every engine, while
    * round() differs between shortest-decimal (Spark) and binary
    * (DuckDB) semantics at .5 boundaries. */
  def quantizeI8(a: Column): Column = {
    // greatest(.., 1e-30) guards the all-zero vector (0·inf = NaN,
    // which DuckDB refuses to cast to INT while Spark nulls it)
    val maxAbs = greatest(
      array_max(transform(a, x => abs(x.cast("double")))), lit(1e-30))
    transform(a, x =>
      floor(x.cast("double") * (lit(127.0) / maxAbs) + lit(0.5)).cast("int"))
  }

  /** Dequantized copy (qᵢ·max|x|/127) for distance computation on
    * quantized storage. */
  def dequantizeI8(q: Column, maxAbs: Column): Column =
    transform(q, x => x.cast("double") * (maxAbs / lit(127.0)))
}
