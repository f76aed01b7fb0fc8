package graft.streaming

import org.apache.spark.sql.DataFrame

/** Standing-index pins taken by streaming gate builders (semdedup's
  * cell index, neardup's band/shingle indexes). The static side of a
  * stream-static join RE-EXECUTES every micro-batch — left
  * unpersisted, each batch re-derives the standing corpus's index,
  * which is exactly the "cost scales with the corpus" failure the
  * gates exist to avoid (measured: the unpinned neardup gate paid
  * ~34 s/batch at sf0.1 — flat, but corpus-sized — vs ~1 s pinned;
  * `probes/stream_ingest_probe_r12_prepin.json` → `_r12.json`). `persist()` registers the
  * plan in the session CacheManager and only `unpersist()` (or
  * session end) releases it, so a driver that rebuilds gates on
  * compaction must release the retired pins or executor storage grows
  * by one index per rebuild. */
object GateIndexes {

  private val pinned =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, DataFrame)]
  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A fresh, never-reused group name (`prefix#N`). Gate builders
    * call this when the caller does not manage groups itself, so two
    * concurrently-live gates of the SAME kind can never collide on a
    * shared default — releasing the retired one must not unpersist
    * the live gate's standing index (that silently reinstates the
    * ~34 s/batch re-derivation the pin exists to prevent). */
  def autoGroup(prefix: String): String =
    s"$prefix#${seq.incrementAndGet()}"

  /** Persist `df` and register it under `group` for [[release]]. Each
    * gate build pins under its own group — auto-generated via
    * [[autoGroup]] unless the caller passes an explicit one — so
    * retiring ONE gate never unpersists a concurrently-running
    * gate's index. Callers passing explicit groups own the
    * one-live-gate-per-group invariant.
    *
    * Re-pinning the SAME plan under the SAME group returns the
    * existing handle instead of appending — a fixed-group caller
    * invoked once per bench repeat (q105b's codebook) keeps ONE
    * registry entry, matching the one storage entry CacheManager's
    * plan-dedup keeps. Distinct groups never coalesce, so the
    * release-isolation contract is untouched. */
  def pin(df: DataFrame, group: String): DataFrame = synchronized {
    val it = pinned.iterator()
    while (it.hasNext) {
      val (g, existing) = it.next()
      if (g == group && existing.queryExecution.analyzed
            .sameResult(df.queryExecution.analyzed))
        return existing
    }
    val p = df.persist()
    pinned.add((group, p))
    p
  }

  /** The groups with at least one live pin, in pin order — lets a
    * compaction driver that relied on auto-generated groups enumerate
    * what is retireable. */
  def liveGroups: Seq[String] = {
    val b = Seq.newBuilder[String]
    val it = pinned.iterator()
    val seen = scala.collection.mutable.HashSet.empty[String]
    while (it.hasNext) { val g = it.next()._1; if (seen.add(g)) b += g }
    b.result()
  }

  /** Unpersist the standing indexes pinned under `group`. Call after
    * stopping that gate's streaming query (e.g. on corpus compaction,
    * before building the replacement gate). Blocking=false: the
    * release is async and safe while executors still hold blocks.
    *
    * Shared-plan guard (effective ref-count): CacheManager dedups
    * persisted plans by `sameResult`, so two gates pinning the SAME
    * standing plan under different groups share ONE storage entry —
    * a naive unpersist here would evict it for BOTH, silently
    * reinstating the per-batch re-derive the pin exists to prevent.
    * An entry is only unpersisted when no pin in another live group
    * resolves to the same plan; otherwise it just leaves the
    * registry and the survivor keeps the cache entry. */
  def release(group: String): Unit = synchronized {
    val it = pinned.iterator()
    while (it.hasNext) {
      val (g, df) = it.next()
      if (g == group) {
        it.remove()
        val sharedElsewhere = {
          val it2 = pinned.iterator()
          var shared = false
          while (!shared && it2.hasNext) {
            val (g2, df2) = it2.next()
            if (g2 != group && df2.queryExecution.analyzed
                  .sameResult(df.queryExecution.analyzed)) shared = true
          }
          shared
        }
        if (!sharedElsewhere) df.unpersist(blocking = false)
      }
    }
  }

  /** Unpersist EVERY pinned index — only safe when no gate query is
    * still running (full shutdown/compaction of all gates); with live
    * gates, prefer [[release]] on the retired gate's group. */
  def releaseAll(): Unit = {
    var e = pinned.poll()
    while (e != null) { e._2.unpersist(blocking = false); e = pinned.poll() }
  }
}
