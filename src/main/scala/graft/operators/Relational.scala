package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/**
 * Relational-core operator suite: scans, projections, filters, joins,
 * aggregations, time-bucketing windows, sorts/top-k, set ops and
 * scalar functions — the SURVEY.md §2.1-§2.8 inventory re-expressed as
 * declarative DataFrame pipelines that Catalyst can push down, prune
 * and (where the dimension side is small) broadcast.
 *
 * Every query here is paired with ANSI SQL in [[graft.oracle.RelationalSql]]
 * for the DuckDB hash-match gate. Floating aggregates are rounded to
 * 4 dp in BOTH engines so accumulation-order noise can't flip the hash.
 */
object Relational {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01,
    "q02_filter_pushdown" -> q02,
    "q03_revenue_by_nation" -> q03,
    "q04_topk_parts_per_flag" -> q04,
    "q05_distinct_counts" -> q05,
    "q06_daily_events" -> q06,
    "q07_event_buckets" -> q07,
    "q08_customers_without_orders" -> q08,
    "q09_top_customer_per_nation" -> q09,
    "q10_user_item_stats" -> q10,
    "q11_user_baskets" -> q11,
    "q12_part_strings" -> q12,
    "q13_order_lifecycle" -> q13,
    "q14_period_ids" -> q14,
    "q15_array_hof" -> q15
  )

  /** A1/P6/T3 — wide aggregation with derived measures (shape of
    * reference Main.scala:93-96 group+collect generalized to the
    * pricing-summary idiom). Partial aggregation (map-side combine)
    * keeps the single shuffle small at any scale. */
  private def q01(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** P1/P3/P4 — filter + projection; predicates and the 4-column
    * ReadSchema reach the parquet scan (PushedFilters). */
  private def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
              col("l_shipdate") <  lit("1997-01-01") &&
              col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))

  /** J1 — multi-way equi-join with small dimensions broadcast
    * (reference disabled broadcast joins globally, Main.scala:340-341;
    * the rebuild deliberately reverts that — region/nation are tiny at
    * any SF, so broadcast-hash avoids two shuffles). */
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
  }

  /** T1 — per-group top-k via window rank (the distributed form of the
    * reference's driver-side sortBy(-score).take(k),
    * UserBasedTopKRecommender.scala:90). Rank keys are (rounded
    * revenue desc, partkey asc) so the pick is deterministic. */
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_partkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("revenue").desc, col("l_partkey").asc)
    rev.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("l_returnflag", "l_partkey", "revenue", "rk")
  }

  /** A3 — exact distinct counts (reference BaseRecommender.scala:60-62).
    * At 100 TB these become approx_count_distinct; exact here because
    * the oracle compares values. */
  private def q05(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      count(lit(1)).as("n_rows"))

  /** W1/F1 — tumbling 1-day time bucketing of the event stream
    * (reference SequentialTopKRecommender.scala:314-319 uses window();
    * date_trunc is the same bucketing with a simpler output type). */
  private def q06(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"),
        // engine-stable rounding: avg over power-of-two group sizes
        // lands on exact-half decimal reprs that Spark's round() and
        // DuckDB's disagree on (see graft.functions.Rounding)
        graft.functions.Rounding.r4(avg(col("value"))).as("avg_value"))

  /** P7/F5 — CASE WHEN bucketing (reference's period-clamp idiom,
    * SequentialTopKRecommender.scala:374-381). */
  private def q07(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("bucket",
        when(col("value") < 50, "low")
          .when(col("value") < 150, "mid")
          .otherwise("high"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))

  /** §2.7 set ops — anti join (the distributed form of the reference's
    * driver-side Set.diff, BaseRecommender.scala:64-71). */
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
  }

  /** T4 — argmax per group, deterministic tie-break by key
    * (reference's rule-argmax, SequentialTopKRecommender.scala:235-238). */
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("n_name"), col("c_custkey"), round(col("c_acctbal"), 4).as("best_acctbal"))
  }

  /** A7/R11 — per-user profile statistics over the long-form ratings
    * view: the mask-aware mean (mean over *rated* cells only,
    * reference UserBasedTopKRecommender.scala:47-51) is just avg() on
    * long form — no dense matrix, no zero-masking needed. */
  private def q10(spark: SparkSession, dir: String): DataFrame =
    Tables.ratings(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_items"),
        round(avg(col("rating")), 4).as("mean_rating"),
        round(min(col("rating")), 4).as("min_rating"),
        round(max(col("rating")), 4).as("max_rating"))

  /** A6/U1 — basket construction: one row per (user, day) with the
    * sorted distinct item set (reference
    * SequentialTopKRecommender.scala:243-255 built a dense one-hot
    * vector per basket; sorted sparse form scales instead). */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey", "l_shipdate")
    val o  = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey").as("user_id"),
        to_date(col("l_shipdate")).as("basket_date"))
      .agg(
        concat_ws(",", transform(sort_array(collect_set(col("l_partkey"))),
          x => x.cast("string"))).as("items"),
        countDistinct(col("l_partkey")).as("n_items"))
  }

  /** F2 — string function family (split/lower/length/format,
    * reference SequentialTopKRecommender.scala:237,191,427). */
  private def q12(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        lower(col("p_brand")).as("brand_lc"),
        length(col("p_name")).as("name_len"),
        element_at(split(col("p_type"), " "), 1).as("type_head"),
        format_string("%s_%d", col("p_brand"), col("p_size")).as("brand_size"))

  /** A5/F1 — min/max + datediff lifecycle agg (reference
    * SequentialTopKRecommender.scala:351-356). */
  private def q13(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"))
      .withColumn("active_days",
        datediff(col("last_order"), col("first_order")).cast("long"))

  /** W3 — dense sequence ids over an ordered distinct set. The
    * reference used monotonically_increasing_id after orderBy
    * (SequentialTopKRecommender.scala:322-327), which is only correct
    * single-partition; row_number over a window is the scale-safe
    * idiom (SURVEY §2.5 W3). */
  private def q14(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("order_date")).distinct()
      .withColumn("period_id",
        row_number().over(Window.orderBy(col("order_date"))).cast("long") - 1)

  /** P5/U4/F4 — higher-order array functions instead of the
    * reference's opaque row-lambdas (SequentialTopKRecommender
    * .scala:481-487): collect, sort, filter within expressions that
    * Catalyst can still see. */
  private def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_partkey"))).as("parts"))
      .select(
        col("l_orderkey"),
        size(col("parts")).as("n_parts"),
        size(filter(col("parts"), x => x % 2 === 1)).as("n_odd_parts"),
        concat_ws(",", transform(col("parts"), x => x.cast("string"))).as("parts_csv"))
      .drop("parts")
}
