package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash: fold h = (h·base + codepoint) mod p
  * over the string's code points.
  *
  * Identical to the HOF formulation
  * `aggregate(sequence(1, length(t)), 0L, (h,i) -> (h*base +
  * ascii(substr(t,i,1))) % p)` (spec-checked) and to the DuckDB oracle's
  * list_reduce fold, but executed as one primitive loop instead of a
  * per-character interpreted lambda frame with a substring allocation —
  * this hash runs once per token/shingle/gram across the whole dedup,
  * embed, and fingerprint family.
  *
  * (base, mod) are parameters so independent hash functions can be
  * combined into a wide digest: one ~30-bit hash over a 100 TB corpus
  * is past its birthday bound (≈2⁴⁰ docs pairs collide), so exact dedup
  * groups on TWO independent (base, mod) hashes — ~60 digest bits, with
  * further (base, mod) pairs available if a deployment wants the full
  * 128. Both moduli stay < 2³⁰ so h·base + cp never overflows a long.
  */
case class PolyHash(child: Expression, base: Long, mod: Long)
  extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_poly_hash expects a string input, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any =
    PolyHash.hash(v.asInstanceOf[UTF8String].toString, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hash($c.toString(), ${base}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "graft_poly_hash"
}

object PolyHash {
  val Mod = 1000000007L
  val Base = 31L

  /** Independent (base, mod) pairs 2-4 for the wide exact-dedup
    * digest; distinct prime moduli so collisions are independent.
    * Four ~30-bit hashes + the length = a ~120-bit digest — past the
    * birthday bound even at 100 TB doc counts (10¹² docs → ~10²⁴
    * pairs vs 2¹²⁰ ≈ 10³⁶ digest space). All moduli < 2³⁰ so
    * h·base + cp never overflows a long. */
  val Base2 = 131L
  val Mod2 = 998244353L
  val Base3 = 137L
  val Mod3 = 1000000009L
  val Base4 = 139L
  val Mod4 = 1000000021L

  /** Shared by interpreted eval and generated code. */
  def hash(s: String, base: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  def apply(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c), Base, Mod))

  /** The independent second/third/fourth hashes (see scaladoc above). */
  def second(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c), Base2, Mod2))
  def third(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c), Base3, Mod3))
  def fourth(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c), Base4, Mod4))
}
