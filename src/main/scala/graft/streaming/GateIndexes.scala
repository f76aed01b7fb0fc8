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
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` and register it for [[releaseAll]]. */
  def pin(df: DataFrame): DataFrame = {
    val p = df.persist()
    pinned.add(p)
    p
  }

  /** Unpersist every standing index pinned by retired gates. Call
    * after stopping a gate's streaming query (e.g. on corpus
    * compaction, before building the replacement gate).
    * Blocking=false: the release is async and safe while executors
    * still hold blocks. */
  def releaseAll(): Unit = {
    var df = pinned.poll()
    while (df != null) { df.unpersist(blocking = false); df = pinned.poll() }
  }
}
