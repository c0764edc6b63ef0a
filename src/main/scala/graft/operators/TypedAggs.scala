package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (the Dataset-native custom aggregate —
  * the third typed API beside flatMapGroups and cogroup): a
  * merge-order-independent exact revenue summer. The buffer is
  * (cents: Long, n: Long) — integer addition commutes and associates,
  * so partial merges from any scheduling produce identical results —
  * and the single cents→dollars division happens once in finish().
  * Input rows arrive pre-converted to cents (the caller owns the
  * decimal cast, keeping the Aggregator itself pure integer math). */
object TypedAggs {

  case class SumBuf(cents: Long, n: Long)

  /** (cents extracted from A) → (dollars, n) exact summer. */
  def revenueAgg[A](cents: A => Long): Aggregator[A, SumBuf, (Double, Long)] =
    new Aggregator[A, SumBuf, (Double, Long)] {
      def zero: SumBuf = SumBuf(0L, 0L)
      def reduce(b: SumBuf, a: A): SumBuf =
        SumBuf(b.cents + cents(a), b.n + 1)
      def merge(a: SumBuf, b: SumBuf): SumBuf =
        SumBuf(a.cents + b.cents, a.n + b.n)
      def finish(b: SumBuf): (Double, Long) =
        (b.cents.toDouble / 100.0, b.n)
      def bufferEncoder: Encoder[SumBuf] = Encoders.product[SumBuf]
      def outputEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    }
}
