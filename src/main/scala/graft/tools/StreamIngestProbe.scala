package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Prices the streaming ingest gates' PER-BATCH cost as the standing
 * state grows — the direct test of the "ingest cost scales with the
 * batch, never the corpus" claim after the round-11 idempotency
 * rework made all state batch-keyed (a batch now lists/reads
 * `batch_id < N` partitions, so the thing to measure is whether
 * per-batch wall drifts upward with batch count).
 *
 * Usage: `run <sfDir> <nBatches>` — splits the documents table into
 * nBatches equal hash-slices, drives
 * [[graft.streaming.CorpusStreams.ingestManifestBatch]] and
 * [[graft.streaming.CorpusStreams.ingestDatasheetBatch]] over them in
 * order against fresh state dirs, and prints one JSON line with the
 * per-batch walls (first-half vs second-half medians summarize the
 * drift).
 */
object StreamIngestProbe {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; s((s.size - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, dir).cache()
    docs.count()
    val base = java.nio.file.Files
      .createTempDirectory("graft_ingest_probe").toString
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    def drive(run: (org.apache.spark.sql.DataFrame, Long) => Unit)
    : Seq[Double] =
      (0 until n).map { b =>
        val batch = docs.filter(pmod(col("doc_id"), lit(n)) === b)
        val t0 = System.nanoTime()
        run(batch, b.toLong)
        (System.nanoTime() - t0) / 1e9
      }

    val manifest = drive((b, id) =>
      graft.streaming.CorpusStreams.ingestManifestBatch(b, id,
        s"$base/manifest", corpusHasLines = false,
        target = graft.operators.Analytics.SHARD_TOKENS,
        minStops = graft.operators.Corpus.Q125_MIN_STOPS))
    val sheet = drive((b, id) =>
      graft.streaming.CorpusStreams.ingestDatasheetBatch(b, id,
        s"$base/sheet", corpusHasLines = false))
    val drift = drive((b, id) =>
      graft.streaming.CorpusStreams.ingestDriftBatch(b, id, s"$base/drift"))

    def halves(xs: Seq[Double]) =
      (median(xs.take(n / 2)), median(xs.drop(n / 2)))
    val (m1, m2) = halves(manifest)
    val (s1, s2) = halves(sheet)
    val (d1, d2) = halves(drift)
    val json =
      s"""{"metric":"stream_ingest_probe","sf_dir":"$dir","n_batches":$n,""" +
        s""""manifest_walls":[${manifest.map(f3).mkString(",")}],""" +
        s""""datasheet_walls":[${sheet.map(f3).mkString(",")}],""" +
        s""""drift_walls":[${drift.map(f3).mkString(",")}],""" +
        s""""manifest_half_medians":[${f3(m1)},${f3(m2)}],""" +
        s""""datasheet_half_medians":[${f3(s1)},${f3(s2)}],""" +
        s""""drift_half_medians":[${f3(d1)},${f3(d2)}]}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("stream_ingest_probe.json"), json)
    println(json)
    spark.stop()
  }
}
