package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection (SURVEY §2.2 dr1) — the
  * standard embedding compression step before storage or coarse ANN:
  * project dim-64 vectors onto `outDim` ±1 pseudo-random hyperplanes
  * (Achlioptas: ±1 entries preserve pairwise distances with the same
  * JL guarantee as Gaussians, and integer signs are exactly
  * reproducible across engines). y_k = ⟨v, s_k⟩ / √outDim.
  *
  * The sign matrix is a deterministic function of (j, k) — squared
  * then multiplied mod p for avalanche; the obvious linear mix
  * ((j·a+k)·c mod p mod 2) produces perfectly ANTI-correlated rows
  * (measured |row·row'| = 64 of 64) because parity composes linearly,
  * while this mixer measures max |row·row'| = 16 ≈ the random
  * expectation. Both engines regenerate the matrix from the formula —
  * nothing is shipped.
  *
  * Scale shape: each output component is one codegen'd DotProduct
  * against a 64-element literal — 16 primitive loops per row inside
  * the scan's codegen span, no shuffle, no join. Output is exploded
  * (vec_id, out_dim, value) rows (driver-hashable, and the layout a
  * columnar sink wants).
  */
object RandomProjection {

  val Mod = 1000000007L
  val Mixer = 2654435761L
  val OutDim = 16

  /** ±1 sign for input dim j, output dim k (shared with the oracle). */
  def sign(j: Int, k: Int): Double = {
    val x = j.toLong * 131 + k + 17
    val h = (x * x % Mod) * Mixer % Mod
    if (h % 2 == 0) 1.0 else -1.0
  }

  /** Project `vecCol` (array<float|double>, length inDim) to outDim
    * exploded components, each rounded to 6 dp. outDim must be a
    * perfect square's root... rather: √outDim must be exact in double
    * (4.0 for outDim 16) so the scaling divides identically in both
    * engines. */
  def project(vecs: DataFrame, vecCol: String, inDim: Int,
              outDim: Int = OutDim): DataFrame = {
    val scale = math.sqrt(outDim.toDouble)
    require(scale == math.rint(scale),
      s"outDim must be a perfect square (got $outDim) so the JL scale " +
        "1/sqrt(outDim) is an exact double both engines share")
    val comps = (0 until outDim).map { k =>
      val signs = Array.tabulate(inDim)(j => sign(j, k))
      round(graft.functions.DotProduct(col(vecCol), lit(signs)) / scale, 6)
    }
    graft.Dist.spread(vecs)
      .select(col("vec_id"), posexplode(array(comps: _*)))
      .select(col("vec_id"), col("pos").as("out_dim"), col("col").as("value"))
  }
}
