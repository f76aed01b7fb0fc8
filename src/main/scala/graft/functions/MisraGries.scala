package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded frequency summary: at most `capacity` (token, count) entries. */
case class MGBuf(counts: Map[String, Long])

/**
 * Misra-Gries heavy-hitter sketch as a typed mergeable Aggregator —
 * the bounded-memory candidate pass of the classic two-pass exact
 * heavy-hitter pipeline (pass 2 recounts candidates exactly).
 *
 * State is at most `m` counters regardless of input size. Guarantee
 * (Misra & Gries 1982; merge bound per Agarwal et al., "Mergeability
 * of Summaries", PODS 2012): after any sequence of reduces and merges
 * over n total items, every item's sketch count underestimates its
 * true count by at most n/(m+1) — so every item with true count
 * > n/(m+1) is PRESENT in the final summary. Downstream callers that
 * filter at a support threshold φ·n with φ > 1/(m+1) therefore get a
 * candidate superset, and an exact recount restricted to candidates
 * yields the EXACT heavy-hitter set while the full-cardinality
 * (token) shuffle never happens — only candidate tokens cross the
 * wire in pass 2. That is the posture that survives 100 TB of text:
 * per-partition map-side sketches of m entries, one merge tree, one
 * filtered recount.
 *
 * reduce: the textbook step — increment a present counter; insert if
 * below capacity; else decrement ALL counters by 1, dropping zeros.
 * merge: sum counts pointwise, then if over capacity subtract the
 * (m+1)-th largest count from every entry and keep the positives
 * (the summary-merge step from the mergeability proof).
 */
class MisraGriesAggregator(m: Int)
    extends Aggregator[String, MGBuf, MGBuf] {

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(buf: MGBuf, tok: String): MGBuf = {
    val c = buf.counts
    c.get(tok) match {
      case Some(n)            => MGBuf(c.updated(tok, n + 1L))
      case None if c.size < m => MGBuf(c.updated(tok, 1L))
      case None =>
        MGBuf(c.collect { case (k, v) if v > 1L => k -> (v - 1L) })
    }
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val sum = b.counts.foldLeft(a.counts) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= m) MGBuf(sum)
    else {
      // (m+1)-th largest value is the decrement that restores the bound
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
      MGBuf(sum.collect { case (k, v) if v > cut => k -> (v - cut) })
    }
  }

  override def finish(buf: MGBuf): MGBuf = buf
  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}
