package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k buffer: items sorted best-first, never more than k. */
case class TopKBuf(items: Seq[(Long, Double)])

/**
 * Typed bounded-heap top-k aggregator (SURVEY §2.6 T1/T2's scale
 * mapping): keeps at most k (id, score) pairs per group while rows
 * stream through, so a group of N rows costs O(N log k) memory-bounded
 * work map-side — the window `row_number() <= k` idiom materializes,
 * sorts and ranks ALL N rows through the shuffle first. Partial
 * buffers merge associatively, so partial aggregation applies and only
 * k rows per group ever cross the wire.
 *
 * Ordering: score DESC with id ASC tie-break — identical to the
 * window-rank queries, so results are engine-deterministic.
 */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), TopKBuf, TopKBuf] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  /** Insert keeping the buffer sorted best-first and bounded at k. */
  private def insert(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front ++ (x +: back)).take(k)
    }

  override def zero: TopKBuf = TopKBuf(Seq.empty)
  override def reduce(buf: TopKBuf, row: (Long, Double)): TopKBuf =
    TopKBuf(insert(buf.items, row))
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf(b.items.foldLeft(a.items)(insert))
  override def finish(buf: TopKBuf): TopKBuf = buf

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
