package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Rounding.r4

/**
 * Event/fact analytics operators rounding out the relational surface:
 * semi-structured (JSON) column extraction, sliding (hopping) time
 * windows, CUBE grouping sets, fixed-width histograms, and per-group
 * z-score outlier detection. Every operator is one narrow map + keyed
 * aggs (partial aggregation applies map-side), so each survives a
 * 100-TB fact table unchanged.
 */
object Analytics {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_json_extract" -> q78,
    "q79_hopping_window" -> q79,
    "q80_cube" -> q80,
    "q82_price_histogram" -> q82,
    "q83_zscore_outliers" -> q83,
    "q86_quantile_buckets" -> q86,
    "q87_quality_checks" -> q87
  )

  /** Semi-structured extraction: the `events.props` column is a JSON
    * payload; pull `$.k` out with a JSON-path expression and aggregate
    * it like any typed column. The extraction is a per-row narrow
    * expression — the JSON never crosses a shuffle, only the extracted
    * int does, and column pruning still drops `props` from scans that
    * don't touch it. (The reference has no JSON surface — SURVEY §2.8
    * "JSON/map functions: none" — this is the beyond-reference slot.) */
  private def q78(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        r4(avg(col("k"))).as("avg_k"),
        countDistinct(col("k")).as("n_distinct_k"))

  /** Sliding (hopping) window: 2-day windows every 1 day, so every
    * event lands in exactly two overlapping windows — the windowed-agg
    * shape a metrics pipeline uses for trailing-window dashboards
    * without a per-row RANGE window (q74's shape). `window(ts, size,
    * slide)` expands each row into size/slide window copies map-side;
    * the agg then partial-aggregates per (window, …) key. Money sums
    * accumulate in DECIMAL (exact, order-independent at any scale). */
  private def q79(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(30,8)")), 4)
          .cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("n"), col("sum_value"))

  /** CUBE grouping sets over (returnflag, linestatus): all four
    * aggregation granularities in ONE pass — Catalyst plans cube as a
    * single Expand (×4) into one keyed agg, versus four separate scans
    * of a 100-TB fact table. Grouping indicator columns disambiguate
    * NULL-as-all from genuine NULLs (q55 covers ROLLUP; this is the
    * full lattice). */
  private def q80(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,8)")), 4).cast("double").as("revenue"))
      .select(coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
        coalesce(col("l_linestatus"), lit("<all>")).as("status"),
        col("g_flag"), col("g_status"), col("n"), col("revenue"))

  /** Histogram bucket width for q82 (price units). */
  val HIST_BUCKET_WIDTH = 500.0

  /** Fixed-width histogram of extendedprice: bucket id is a narrow
    * per-row floor, the rest is one keyed agg — the scale-correct way
    * to get a distribution (an ntile/global-sort discretization would
    * funnel the corpus through few partitions; a fixed grid never
    * shuffles more than |buckets| rows). floor(x / w) is a single IEEE
    * op both engines evaluate bit-identically. */
  private def q82(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") / HIST_BUCKET_WIDTH)
        .cast("long").as("bucket"), col("l_extendedprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        r4(min(col("l_extendedprice"))).as("min_price"),
        r4(max(col("l_extendedprice"))).as("max_price"),
        round(sum(col("l_extendedprice").cast("decimal(30,8)")), 4)
          .cast("double").as("sum_price"))

  /** |z| threshold for q83. */
  val Z_THRESH = 2.5

  /** Per-group z-score outliers: two passes over events — a per-type
    * moment agg (n, Σv, Σv²) and a broadcast join back to score every
    * event. Float discipline: the sums accumulate in DECIMAL (v is
    * quantized at 6 dp first, so v and v² are exact decimals and the
    * sums are order-independent); μ and σ then derive from those exact
    * decimals through one fixed double expression, and z = (v − μ)/σ is
    * a single IEEE sequence both engines evaluate bit-identically — the
    * |z| > τ comparison needs no rounding guard. Moment stats are a
    * |types|-row broadcast dim; the fact side never shuffles. */
  private def q83(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,6)").as("vd"))
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("vd")).as("s"),
        sum(col("vd") * col("vd")).as("ss"))
      .select(col("event_type"),
        (col("s").cast("double") / col("n")).as("mu"),
        sqrt(col("ss").cast("double") / col("n") -
          (col("s").cast("double") / col("n")) *
          (col("s").cast("double") / col("n"))).as("sigma"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", (col("vd").cast("double") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) > Z_THRESH)
      .select(col("event_id"), col("event_type"),
        r4(col("vd").cast("double")).as("value"), r4(col("z")).as("zscore"))
  }

  /** Quantile-bucket discretization — the `QuantileDiscretizer` shape
    * done join-wise: per-group exact quartile boundaries (one ordered-
    * statistics agg into a |groups|-row dim), broadcast back over the
    * facts, bucket = 1 + Σ(v > boundary) as three narrow comparisons.
    * The facts never shuffle and never sort — the discretization an
    * ntile window would do with a per-group global sort happens as a
    * map-side expression. Exact `percentile` sorts each GROUP's values
    * (fine for bounded groups; [[q53b]]'s mergeable sketch is the
    * unbounded-group path — same join-back shape either way). Spark's
    * `percentile` and DuckDB's `quantile_cont` both interpolate at
    * (n−1)·p, so boundaries and the > comparisons are engine-identical
    * with no rounding guard. */
  private def q86(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25)").as("b25"),
        expr("percentile(value, 0.5)").as("b50"),
        expr("percentile(value, 0.75)").as("b75"))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("bucket",
        (lit(1) + (col("value") > col("b25")).cast("int")
          + (col("value") > col("b50")).cast("int")
          + (col("value") > col("b75")).cast("int")))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        r4(min(col("value"))).as("min_v"),
        r4(max(col("value"))).as("max_v"))
  }

  /** Expectation rules for q87: (col, distinct lo/hi, lexicographic
    * domain lo/hi); nulls skip that rule family for the column. The
    * l_returnflag distinct bound [1,2] FAILS deliberately (3 flags
    * exist) — a report that can't fail proves nothing. */
  val QUALITY_RULES: Seq[(String, java.lang.Long, java.lang.Long, String, String)] = Seq(
    ("l_returnflag", 1L, 2L, "A", "R"),
    ("l_linestatus", 1L, 3L, null, null),
    ("l_linenumber", 1L, 10L, null, null),
    ("l_shipdate", null, null, "1992-01-01 00:00:00", "2002-12-31 23:59:59"))

  /** Data-quality expectation report (the Deequ/Great-Expectations
    * shape): declared rules checked against the one-pass column
    * profile (q77's [[Relational.lineitemProfile]]). Completeness
    * (integer fill percent — engine-portable, no float ratio) for
    * every profiled column; distinct-cardinality and lexicographic
    * domain bounds where declared. Emits (col_name, check_name,
    * passed, observed).
    *
    * Scale shape: ONE profile pass (the q77 plan — one scan, one
    * Expand) left-joined to a broadcast rules dim; all three check
    * families ride one exploded array so the profile is never
    * recomputed per family. The report is |cols|·|families| rows —
    * driver-readable at any data scale. */
  private def q87(spark: SparkSession, dir: String): DataFrame = {
    val rules = spark.createDataFrame(QUALITY_RULES)
      .toDF("col_name", "lo", "hi", "dlo", "dhi")
    Relational.lineitemProfile(spark, dir)
      .join(broadcast(rules), Seq("col_name"), "left")
      .select(col("col_name"), explode(array(
        struct(lit("completeness").as("check_name"),
          (expr("n_filled * 100 DIV n_rows") >= 100).cast("int").as("passed"),
          expr("CAST(n_filled * 100 DIV n_rows AS STRING)").as("observed")),
        struct(when(col("lo").isNotNull, "distinct_bounds").as("check_name"),
          col("n_distinct").between(col("lo"), col("hi")).cast("int").as("passed"),
          col("n_distinct").cast("string").as("observed")),
        struct(when(col("dlo").isNotNull, "domain_bounds").as("check_name"),
          (col("min_v") >= col("dlo") && col("max_v") <= col("dhi"))
            .cast("int").as("passed"),
          concat(col("min_v"), lit(".."), col("max_v")).as("observed"))
      )).as("c"))
      .filter(col("c.check_name").isNotNull)
      .select(col("col_name"), col("c.check_name").as("check_name"),
        col("c.passed").as("passed"), col("c.observed").as("observed"))
  }
}
