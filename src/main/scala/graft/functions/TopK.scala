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

/** Bounded distinct-set collector: keeps up to `cap` DISTINCT values per
  * group, insertion-capped — once full, further new values are dropped,
  * so a group at the cap is exactly "distinct count ≥ cap" (the only
  * question a df-threshold below `cap` ever asks of it). Partial state
  * ships at most `cap` longs per group per task, so a viral key cannot
  * blow up map-side state or the shuffle — the 100 TB-safe way to build
  * df-capped posting lists in ONE aggregation instead of
  * distinct → df-count → anti-join → collect_list (three corpus-shaped
  * exchanges). Output sorted ascending; `size(out)` is the exact
  * distinct count whenever it is < cap.
  */
final class CappedDistinctLongs(cap: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(cap > 0)

  override def zero: Seq[Long] = Vector.empty
  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    // contains() is a ≤cap-element scan — cheap at posting-list caps,
    // and the buffer stays a flat Vector the encoder handles natively
    if (b.length >= cap || b.contains(a)) b else b :+ a
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    b2.foldLeft(b1)(reduce)
  override def finish(b: Seq[Long]): Seq[Long] = b.sorted

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
