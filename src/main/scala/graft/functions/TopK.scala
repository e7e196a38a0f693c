package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.13 custom-aggregate surface):
  * keeps a bounded sorted buffer per group, so partial aggregation
  * (map-side combine) ships at most k doubles per group per task —
  * the 100 TB-friendly alternative to collect_list + slice, whose
  * intermediate state is unbounded.
  */
final class TopKDoubles(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k > 0)

  override def zero: Seq[Double] = Vector.empty

  // INVARIANT: the buffer is always sorted descending (bound() sorts and
  // zero is empty), so the k-th best is xs.last and a full buffer
  // rejects a below-minimum row in O(1) — the common case on the hot
  // map-side path — instead of re-sorting k+1 elements per input row
  private def bound(xs: Seq[Double]): Seq[Double] = xs.sortBy(-_).take(k)

  override def reduce(b: Seq[Double], a: Double): Seq[Double] =
    if (b.length == k && a <= b.last) b else bound(b :+ a)
  override def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] = bound(b1 ++ b2)
  override def finish(b: Seq[Double]): Seq[Double] = b

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
