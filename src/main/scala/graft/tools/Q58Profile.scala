package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{SeqRecommender, Sequential}
import graft.sources.Tables

/** Scratch diagnostic: phase-by-phase wall split of q58's eager build
  * (which jobs own the sf-constant floor). Not part of any contract. */
object Q58Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).repartition(32).groupBy((col("id") % 97).as("k"))
      .count().write.mode("overwrite").format("noop").save()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q58prof] $name%-18s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    val trans = t("trans.cache+count") {
      val tr = SeqRecommender.transactions(spark, dir).cache(); tr.count(); tr
    }
    val titems = trans.select("t_id", "item_id")
    val tn = titems.groupBy("t_id").agg(count(lit(1)).as("n"))
    val seedIds = titems.select("t_id").distinct().orderBy("t_id")
      .limit(SeqRecommender.NUM_CLUSTERS)
    val c0 = t("c0.checkpoint") {
      titems.join(seedIds, Seq("t_id"))
        .select(col("t_id").as("cluster"), col("item_id"), lit(1.0).as("w"))
        .localCheckpoint(true)
    }
    // inline copies of assign/recenter (private in SeqRecommender)
    import graft.functions.Rounding.r6
    import org.apache.spark.sql.expressions.Window
    def assign(cents: org.apache.spark.sql.DataFrame) = {
      val cdim = cents.groupBy("cluster").agg(sum(col("w") * col("w")).as("sqn"))
      val dots = titems.join(cents, Seq("item_id"))
        .groupBy(col("t_id"), col("cluster")).agg(sum(col("w")).as("dot"))
      val grid = tn.crossJoin(broadcast(cdim))
        .join(dots, Seq("t_id", "cluster"), "left")
        .select(col("t_id"), col("cluster"),
          r6(col("n").cast("double") + col("sqn")
            - lit(2.0) * coalesce(col("dot"), lit(0.0))).as("d2"))
      grid.groupBy(col("t_id"))
        .agg(min(struct(col("d2"), col("cluster"))).as("b"))
        .select(col("t_id"), col("b").getField("cluster").as("cluster"))
    }
    def recenter(assigned: org.apache.spark.sql.DataFrame) = {
      val nc = assigned.groupBy("cluster").agg(count(lit(1)).as("nc"))
      assigned.join(titems, Seq("t_id"))
        .groupBy(col("cluster"), col("item_id")).agg(count(lit(1)).as("cnt"))
        .join(broadcast(nc), Seq("cluster"))
        .select(col("cluster"), col("item_id"),
          r6(col("cnt").cast("double") / col("nc")).as("w"))
    }
    var c = c0
    for (i <- 1 to SeqRecommender.KMEANS_ITERS) {
      val a = t(s"assign$i.ckpt") { assign(c).localCheckpoint(true) }
      c = t(s"recenter$i.ckpt") { recenter(a).localCheckpoint(true) }
    }
    val assigned = t("finalAssign.cache") { val a = assign(c).cache(); a.count(); a }
    val baskets = t("baskets.cache+count") {
      val b = SeqRecommender.clusterTokens(trans, assigned)
        .groupBy("user_id").agg(sort_array(collect_set(col("token"))).as("items"))
        .cache()
      b.count(); b
    }
    val nB = baskets.count()
    val rules = t("mineSeqRules(fit)") {
      val r = SeqRecommender.mineSeqRules(baskets, nB); r.count(); r
    }
    t("scoreRules build") {
      SeqRecommender.scoreRules(trans, assigned, baskets, rules, SeqRecommender.TOP_K)
    }
    spark.stop()
  }
}
