package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst kernel for multi-table random-hyperplane LSH
  * bucketing: ALL `tables`×`bits` sign-bit projections of one vector
  * in a single fused loop, returning the per-table bucket codes as
  * `array<long>`.
  *
  * Semantically identical to the expression-tree formulation
  * (`array(sum_b(when(dot(v, plane_tb) >= 0, 1L<<b).otherwise(0)))`,
  * see VectorSearch.hyperplaneBucketsHof): the same sequential double
  * fold per plane (products of ±1 weights are exact negations/copies,
  * so the fold is bit-reproducible and oracle-matched), a bit
  * contributes 0 whenever its dot is null (null vector, length
  * mismatch, null element — the `when` chain's otherwise branch),
  * which collapses to an all-zero bucket array since every plane
  * spans every dimension; a NaN dot sets the bit (Spark's comparison
  * order puts NaN above every double, so `dot >= 0.0` is true),
  * collapsing a NaN element to the all-ones code. The output is
  * therefore never null.
  *
  * The difference is cost, and it is the difference that made the LSH
  * pair family look compute-bound at scale: the tree form is
  * `tables`×`bits` separate DotProduct nodes, each against its own
  * 64-element literal — at the sf100 width (8×16 planes) a 128-node
  * expression whose generated method blows past the JIT inlining
  * budget and runs effectively interpreted (~1.5 ms per vector; the
  * d10 rung profile showed 93% of the 700 s run inside the two bucket
  * stages, scoring the 2.1 G candidate multiset only 37 s). The fused
  * triple loop is a few KB of bytecode regardless of width and runs at
  * FMA speed (~2 µs per vector at 8×16×64).
  */
case class HyperplaneBuckets(child: Expression, flat: IndexedSeq[Double],
                             tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** A bucket array is produced for every input, including null /
    * malformed vectors (all-zero codes) — mirrors the tree form, where
    * each bit's `when` falls to `otherwise(0)` on a null dot. */
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      if (flat.length == tables * bits * dim) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets: ${flat.length} weights for $tables*$bits*$dim planes")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<float|double>, got ${other.simpleString}")
  }

  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val w: Array[Double] = flat.toArray

  override def eval(input: InternalRow): Any = {
    val out = new Array[Long](tables)
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        val v = new Array[Double](dim)
        var ok = true
        var i = 0
        while (ok && i < dim) {
          if (arr.isNullAt(i)) ok = false
          else {
            v(i) = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            i += 1
          }
        }
        if (ok) {
          var off = 0
          var t = 0
          while (t < tables) {
            var bucket = 0L
            var b = 0
            while (b < bits) {
              var s = 0.0
              var j = 0
              while (j < dim) { s += v(j) * w(off + j); j += 1 }
              // !(s < 0) not (s >= 0): Spark's comparison operators
              // order NaN above every double, so the tree form's
              // `dot >= 0.0` is TRUE for a NaN dot and the bit is SET
              // (HyperplaneBucketsSpec pins a NaN element to the
              // all-ones code). Java's s >= 0.0 would silently flip
              // NaN to unset.
              if (!(s < 0.0)) bucket += (1L << b)
              off += dim
              b += 1
            }
            out(t) = bucket
            t += 1
          }
        }
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("hyperplaneW", w, "double[]")
    val out = ctx.freshName("hpOut")
    val arr = ctx.freshName("hpArr")
    val v = ctx.freshName("hpV")
    val ok = ctx.freshName("hpOk")
    val i = ctx.freshName("i")
    val t = ctx.freshName("t")
    val b = ctx.freshName("b")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val off = ctx.freshName("off")
    val bucket = ctx.freshName("bucket")
    val getElem =
      if (childIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val code = code"""
      |${c.code}
      |long[] $out = new long[$tables];
      |if (!${c.isNull}) {
      |  org.apache.spark.sql.catalyst.util.ArrayData $arr = ${c.value};
      |  if ($arr.numElements() == $dim) {
      |    double[] $v = new double[$dim];
      |    boolean $ok = true;
      |    for (int $i = 0; $i < $dim; $i++) {
      |      if ($arr.isNullAt($i)) { $ok = false; break; }
      |      $v[$i] = $getElem;
      |    }
      |    if ($ok) {
      |      int $off = 0;
      |      for (int $t = 0; $t < $tables; $t++) {
      |        long $bucket = 0L;
      |        for (int $b = 0; $b < $bits; $b++) {
      |          double $s = 0.0;
      |          for (int $j = 0; $j < $dim; $j++) {
      |            $s += $v[$j] * $wRef[$off + $j];
      |          }
      |          if (!($s < 0.0)) $bucket += (1L << $b);
      |          $off += $dim;
      |        }
      |        $out[$t] = $bucket;
      |      }
      |    }
      |  }
      |}
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
      |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
    """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "graft_hyperplane_buckets"

  /** Don't splat 3072 weight doubles into every plan string (the
    * schedule is deterministic from its shape + the shared seed). */
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"planes=${tables}x${bits}x$dim")
}

object HyperplaneBuckets {

  /** Bucket column from the standard `weights(table)(bit)(dim)`
    * schedule; weights are flattened into the expression's
    * structurally-comparable form so plans built from equal schedules
    * canonicalize equal (literal-style plan reuse still applies). */
  def apply(v: Column, weights: Array[Array[Array[Double]]]): Column = {
    val tables = weights.length
    val bits = weights.headOption.map(_.length).getOrElse(0)
    val dim = weights.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
    require(weights.forall(t => t.length == bits && t.forall(_.length == dim)),
      "hyperplane weight schedule must be rectangular")
    GraftBridge.column(HyperplaneBuckets(
      GraftBridge.expression(v),
      weights.flatten.flatten.toIndexedSeq, tables, bits, dim))
  }
}
