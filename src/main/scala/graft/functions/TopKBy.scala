package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): per-group top-k payloads by
  * (key desc, payload asc) — the bounded-heap alternative to a
  * `row_number` window for "top k per group".
  *
  * Why an Aggregator and not a window: a window rank SORTS every group
  * in full after shuffling every row, while an Aggregator participates
  * in partial aggregation — each map task reduces its rows into a
  * k-bounded buffer and only buffers cross the shuffle. For top-k over
  * heavy groups at 100 TB that is the difference between shuffling the
  * corpus and shuffling |groups| * k rows.
  *
  * Determinism: the buffer is kept sorted by (key desc, payload asc)
  * and truncated at k; merge re-sorts the concatenation under the same
  * total order, so the result is independent of row order and
  * partitioning (ties broken by payload).
  */
class TopKByAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  // Key order must MATCH the window spelling's ORDER BY key DESC:
  // negating the key is not order-reversing for NaN (NaN must rank
  // LARGEST, as in Spark/DuckDB), so compose TotalOrdering.reverse
  // instead; `+ 0.0` normalizes -0.0 to 0.0 (the engines compare the
  // two zeros equal, TotalOrdering does not).
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), Double](_._1 + 0.0)(
      Ordering.Double.TotalOrdering.reverse).orElseBy(_._2)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(b: Seq[(Double, Long)],
      a: (Double, Long)): Seq[(Double, Long)] =
    if (b.length == k && ord.lteq(b.last, a)) b
    else ((a +: b).sorted(ord)).take(k)

  override def merge(x: Seq[(Double, Long)],
      y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (x ++ y).sorted(ord).take(k)

  override def finish(b: Seq[(Double, Long)]): Seq[Long] = b.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
