package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Rounding.r6

/**
 * Sequential-pipeline operators (SURVEY.md §2.10 R8 fragments):
 * derived-width time periods with end-clamp (W2, reference
 * SequentialTopKRecommender.scala:349-401) and association-rule
 * support/confidence recounted through a broadcast containment join
 * (A11/U6, reference `getSupport` closure at :492-519 — re-expressed
 * as a join instead of a collected-transactions UDF).
 */
object Sequential {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_periods_w2" -> q28,
    "q29_rule_support" -> q29
  )

  val NUM_PERIODS = 8

  /** W2: split the full order-date span into 8 equal-width periods
    * (width = ceil((span+1)/8) days) and clamp the tail — assignment is
    * pure integer arithmetic against a 1-row broadcast bounds
    * dimension, the join-based replacement for the reference's
    * range-scan UDF (U2, SequentialTopKRecommender.scala:280-300). */
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val bounds = o.agg(
      min(col("o_orderdate")).as("dmin"),
      max(col("o_orderdate")).as("dmax"))
      .select(col("dmin"),
        (datediff(col("dmax"), col("dmin")) + 1).cast("long").as("span"))
      .withColumn("width",
        ceil(col("span").cast("double") / NUM_PERIODS).cast("long"))
    o.crossJoin(broadcast(bounds))
      .select(col("o_custkey"),
        least(expr("CAST(datediff(o_orderdate, dmin) AS BIGINT) DIV width"),
          lit(NUM_PERIODS - 1L)).as("period_id"),
        col("width"), col("span"))
      .groupBy(col("period_id"), col("width"), col("span"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"))
      .select(col("period_id"),
        (col("period_id") * col("width")).as("start_off"),
        least((col("period_id") + 1) * col("width"), col("span")).as("end_off"),
        col("n_orders"), col("n_custs"))
  }

  /** A11/U6: mine frequent item pairs (support threshold scaled to
    * basket count), then RECOUNT support and confidence by joining the
    * broadcast rule set against per-user baskets with an array
    * containment predicate — the scale shape for rule scoring: rules
    * are small and ride the broadcast; baskets never leave their
    * partitions. */
  private def q29(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.ratings(spark, dir).select(col("user_id"), col("item_id"))
    val baskets = r.groupBy("user_id").agg(collect_set(col("item_id")).as("items"))
    val nb = baskets.agg(count(lit(1)).as("n_baskets"))
    val icnt = r.groupBy("item_id").agg(count(lit(1)).as("cnt_i"))

    val a = r.select(col("user_id"), col("item_id").as("i"))
    val b = r.select(col("user_id"), col("item_id").as("j"))
    val pairs = a.join(b, Seq("user_id")).filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("cnt"))
    val rules = pairs.crossJoin(broadcast(nb))
      .filter(col("cnt") >=
        greatest(lit(4L), ceil(col("n_baskets") * 0.004).cast("long")))
      .select(col("i"), col("j"))

    val recount = baskets.join(rules.hint("broadcast"),
        array_contains(col("items"), col("i")) &&
          array_contains(col("items"), col("j")))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("cnt2"))

    recount.crossJoin(broadcast(nb))
      .join(broadcast(icnt.select(col("item_id").as("i"), col("cnt_i"))), Seq("i"))
      .select(col("i").as("antecedent"), col("j").as("consequent"),
        r6(col("cnt2").cast("double") / col("n_baskets")).as("support"),
        r6(col("cnt2").cast("double") / col("cnt_i")).as("confidence"))
  }
}
