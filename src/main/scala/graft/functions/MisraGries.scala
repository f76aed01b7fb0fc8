package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded frequency summary: at most `capacity` (token, count)
  * entries in `counts`, plus an EXACT side-buffer `fresh` of at most
  * `capacity` entries awaiting the next compaction (so physical state
  * is ≤ 2·capacity entries; `counts` alone is the summary consumers
  * read after finish/merge, and both are ≤ capacity there). */
case class MGBuf(counts: Map[String, Long],
                 fresh: Map[String, Long] = Map.empty)

/**
 * Misra-Gries heavy-hitter sketch as a typed mergeable Aggregator —
 * the bounded-memory candidate pass of the classic two-pass exact
 * heavy-hitter pipeline (pass 2 recounts candidates exactly).
 *
 * State is at most 2·`m` counters regardless of input size. Guarantee
 * (Misra & Gries 1982; merge bound per Agarwal et al., "Mergeability
 * of Summaries", PODS 2012): after any sequence of reduces and merges
 * over n total items, every item's summary count underestimates its
 * true count by at most n/(m+1) — so every item with true count
 * > n/(m+1) is PRESENT in the final summary. Downstream callers that
 * filter at a support threshold φ·n with φ > 1/(m+1) therefore get a
 * candidate superset, and an exact recount restricted to candidates
 * yields the EXACT heavy-hitter set while the full-cardinality
 * (token) shuffle never happens — only candidate tokens cross the
 * wire in pass 2. That is the posture that survives 100 TB of text:
 * per-partition map-side sketches of ≤2m entries, one merge tree, one
 * filtered recount.
 *
 * reduce (round-11 rework, amortized O(1)): the textbook step
 * decrements ALL counters when a new key arrives at capacity — O(m)
 * per eviction, O(n·m) on the tail-heavy streams a real corpus IS
 * (most bigrams are singletons, so almost every arrival evicts).
 * Here a present key increments its summary counter directly (exact
 * mass, O(1)), an absent key lands in the EXACT side-buffer `fresh`
 * (error 0 by construction, O(1)), and when `fresh` reaches m
 * distinct keys it is folded into `counts` by ONE summary merge —
 * the Agarwal et al. step: sum pointwise, subtract the (m+1)-th
 * largest count from every entry, keep the positives. The O(m log m)
 * fold amortizes over the ≥m arrivals that filled the buffer, and
 * the error bound telescopes exactly as in the mergeability proof
 * (each fold destroys ≥(m+1)·cut total mass for a cut-sized error),
 * so the n/(m+1) presence guarantee is unchanged — property-spec'd
 * over 200 random split+merge trials.
 *
 * merge: compact both sides (fold their buffers), then one summary
 * merge of the two ≤m-entry summaries. finish: compact, so consumers
 * always read a ≤m-entry `counts` with the full guarantee.
 */
class MisraGriesAggregator(m: Int)
    extends Aggregator[String, MGBuf, MGBuf] {

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(buf: MGBuf, tok: String): MGBuf = {
    val c = buf.counts
    c.get(tok) match {
      case Some(n) => buf.copy(counts = c.updated(tok, n + 1L))
      case None =>
        val f = buf.fresh.updated(tok,
          buf.fresh.getOrElse(tok, 0L) + 1L)
        if (f.size < m) buf.copy(fresh = f)
        else MGBuf(summaryMerge(c, f))
    }
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf =
    MGBuf(summaryMerge(compact(a), compact(b)))

  /** Fold the exact side-buffer into the summary. */
  private def compact(buf: MGBuf): Map[String, Long] =
    if (buf.fresh.isEmpty) buf.counts
    else summaryMerge(buf.counts, buf.fresh)

  /** The summary-merge step from the mergeability proof: sum counts
    * pointwise, then if over capacity subtract the (m+1)-th largest
    * count from every entry and keep the positives. Both inputs must
    * themselves be valid summaries (an exact count map is one, with
    * error 0). */
  private def summaryMerge(a: Map[String, Long],
                           b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= m) sum
    else {
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
      sum.collect { case (k, v) if v > cut => k -> (v - cut) }
    }
  }

  override def finish(buf: MGBuf): MGBuf = MGBuf(compact(buf))
  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}
