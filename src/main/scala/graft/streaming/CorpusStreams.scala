package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Streaming corpus-prep surfaces — the ingest-side twins of the
  * [[graft.operators.Corpus]] batch pipeline (VERDICT r9 next #6).
  */
object CorpusStreams {

  /** Streaming manifest-on-ingest — the q125
    * [[graft.operators.Corpus.trainingManifest]] as a `foreachBatch`
    * ingest pipeline. Per micro-batch, against STANDING state under
    * `outDir`:
    *
    *   1. exact-dedup — canonical-min-doc_id within the batch, then an
    *      anti-join against the standing seen-hash set (the q95
    *      incremental posture: ingest cost scales with the batch,
    *      never the corpus — the standing set is the static side)
    *   2. quality keep — [[graft.operators.TextOps.gopherFlags]]
    *      conjunction, same `minStops` dial as the batch twin
    *   3. train split — [[graft.operators.Corpus.splitAssign]]
    *   4. shard assignment — each source's running token offset is
    *      KEYED STATE (the q119 cumsum continued across batches): docs
    *      lay out in (hkey, doc_id) order WITHIN the batch and a doc
    *      opens shard ⌊(offset+prev_cum)/target⌋
    *
    * Appends doc-level manifest rows to `outDir/manifest` partitioned
    * by batch id (the [[EventStreams.writeBatchIdempotent]] replay
    * discipline: a crash-replayed batch OVERWRITES its own partition
    * instead of duplicating it); state updates are guarded by a
    * per-batch marker so a replayed batch never double-advances the
    * offsets or re-appends its hashes.
    *
    * Semantics vs the batch twin: the keep DECISIONS (dedup winner,
    * quality, split) are order-independent and match
    * `trainingManifest` exactly on the same rows; shard COMPOSITION is
    * arrival-ordered across batches (the honest semantics of an
    * append-only ingest — the batch twin's global hash order only
    * exists when the whole corpus is visible at once). Single-batch
    * ingest from empty state reproduces the batch manifest
    * bit-for-bit; multi-batch ingest preserves the q119 invariants
    * (per-source totals, and no shard over target + one doc's
    * tokens). Both are parity-spec'd in StreamingSpec.
    *
    * State bound (SCALE.md): the seen-hash set grows with the CORPUS
    * (32-hex rows — the same standing index the q95 gate carries; it
    * is the static side of a stream-static anti-join and never
    * shuffles per batch) and the offsets state is ONE ROW PER SOURCE
    * — bytes. Everything else is batch-sized.
    */
  def manifestStream(docs: DataFrame, outDir: String, checkpointDir: String,
                     corpusHasLines: Boolean,
                     target: Long = graft.operators.Analytics.SHARD_TOKENS,
                     minStops: Long = graft.operators.TextOps.GOPHER_MIN_STOPS)
  : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) =>
        ingestManifestBatch(b, id, outDir, corpusHasLines, target, minStops))
      .start()

  /** One micro-batch of [[manifestStream]] — exposed so the parity
    * spec can drive it directly and so a batch backfill can reuse the
    * exact ingest semantics. */
  def ingestManifestBatch(batch: DataFrame, batchId: Long, outDir: String,
                          corpusHasLines: Boolean, target: Long,
                          minStops: Long): Unit = {
    import graft.operators.{Corpus, Dedup, TextOps}
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    val marker = s"$outDir/_batches/batch_id=$batchId"
    if (exists(marker)) return // replayed batch: manifest partition
    // already written (or will be overwritten below) and state already
    // advanced — never advance it twice

    val hashesPath = s"$outDir/state_hashes"
    val offsetsPath = s"$outDir/state_offsets"

    val keyed = batch.withColumn("h", md5(Dedup.normText(col("text"))))
    val canon = keyed.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
    val inBatch = keyed.join(canon, Seq("h", "doc_id"), "left_semi")
    val fresh =
      if (exists(hashesPath))
        inBatch.join(spark.read.parquet(hashesPath), Seq("h"), "left_anti")
      else inBatch
    val pass = TextOps.gopherFlags(fresh, corpusHasLines, minStops)
      .filter(col("gopher_pass") === 1).select(col("doc_id"))
    val train = fresh
      .filter(Corpus.splitAssign(col("doc_id")) === "train")
      .join(pass, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("source"),
        size(graft.functions.VectorFns.tokens(col("text"))).cast("long")
          .as("n_tok"),
        Dedup.baseHash(concat(col("doc_id").cast("string"), lit("_shard")))
          .as("hkey"))

    // per-source running offsets: ≤ one tiny row per source — driver map
    val offsets: Map[String, Long] =
      if (exists(offsetsPath))
        spark.read.parquet(offsetsPath).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      else Map.empty
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (s, o)) =>
      when(col("source") === s, lit(o)).otherwise(acc) }
    // batch-local layout in (hkey, doc_id) order — the window is
    // BATCH-sized, never corpus-sized
    val w = Window.partitionBy(col("source")).orderBy(col("hkey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = train
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("off", offCol)
      .withColumn("shard_id", expr(s"(off + cum - n_tok) DIV $target"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("shard_id"))
      .cache()

    // manifest partition: overwrite-by-batch-id = replay-safe append
    rows.write.mode("overwrite").parquet(s"$outDir/manifest/batch_id=$batchId")
    // advance state: new hashes append; offsets rewrite (tiny)
    keyed.select(col("h")).distinct()
      .write.mode("append").parquet(hashesPath)
    val advanced = rows.groupBy(col("source"))
      .agg(sum(col("n_tok")).as("batch_tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = (offsets.keySet ++ advanced.keySet).toSeq.map { s =>
      (s, offsets.getOrElse(s, 0L) + advanced.getOrElse(s, 0L)) }
    import spark.implicits._
    merged.toDF("source", "off").coalesce(1)
      .write.mode("overwrite").parquet(offsetsPath)
    rows.unpersist()
    // marker LAST: a crash anywhere above replays the whole batch
    spark.range(1).select(lit(batchId).as("batch_id"))
      .write.mode("overwrite").parquet(marker)
  }

  /** The shard-level manifest view over the doc-level ingest rows —
    * the same shape [[graft.operators.Analytics.shardPlan]] emits. */
  def shardManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/manifest")
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("shard_tokens"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
}
