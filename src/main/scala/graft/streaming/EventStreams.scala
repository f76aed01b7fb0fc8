package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming surface (SURVEY.md §2.12 — the reference has NO
 * streaming path; its batch tumbling-window basket/period logic ports
 * directly, as the survey's rebuild note anticipates). The transforms
 * take any events DataFrame — batch or streaming — so the SAME code
 * backs the batch queries and the `readStream` pipelines; specs assert
 * stream/batch parity on identical input.
 *
 * Scale posture: watermarked tumbling windows keep state bounded (late
 * rows beyond the watermark are dropped instead of accumulating);
 * aggregation state is keyed on (window, key), so it shards across
 * executors like any other keyed shuffle.
 */
object EventStreams {

  /** An events-parquet ingest DIRECTORY as a stream (the standard
    * file-source contract: producers drop part files into the
    * directory, the stream picks them up). Explicit nanos schema — a
    * streaming source cannot infer one — rebuilt to a micros timestamp
    * exactly like the batch reader (graft.sources.Tables.events). */
  def readEventStream(spark: SparkSession, ingestDir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(ingestDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Tumbling-window event statistics — the streaming twin of the
    * batch q06/q40 aggregation. Works unchanged on a batch DataFrame
    * (watermark is a no-op there). */
  def windowedEventStats(events: DataFrame, windowLen: String,
                         watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming basket builder: per (user, window) distinct item sets —
    * the A6 basket construction as an incremental stateful aggregation
    * (the reference rebuilt baskets from scratch each fit,
    * SequentialTopKRecommender.scala:243-245). */
  def windowedBaskets(events: DataFrame, windowLen: String,
                      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("basket"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("user_id"),
        col("basket"), col("n_events"))
}
