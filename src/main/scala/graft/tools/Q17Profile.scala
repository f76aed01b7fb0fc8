package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.Recommender
import graft.functions.Rounding.r4

/** Scratch diagnostic (r15): piecewise wall split of q17's warm path —
  * which stage owns the post-cache floor. Not part of any contract. */
object Q17Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "20000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[q17prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val r = Tables.ratingsCached(spark, dir)
    val sims = Recommender.itemSimsCached(spark, dir)
    t("warm sims+ratings") { noop(sims) }
    t("sims scan again") { noop(sims) }
    val tgt = r.filter(col("user_id") % 20 === 0)
      .select(col("user_id").as("u"), col("item_id").as("j"), col("rating").as("r_uj"))
    val cand = sims.join(tgt.hint("broadcast"), Seq("j"))
      .select(col("u"), col("i"), col("j"), col("sim"), col("r_uj"))
    t("cand (no shuffle)") { noop(cand) }
    val wNb = Window.partitionBy(col("u"), col("i"))
      .orderBy(col("sim").desc, col("j").asc)
    val top8 = cand.withColumn("nrk", row_number().over(wNb))
      .filter(col("nrk") <= 8)
    t("cand+window top8") { noop(top8) }
    val scored = top8.groupBy(col("u"), col("i"))
      .agg(r4(sum(col("sim") * col("r_uj")) / sum(abs(col("sim")))).as("score"))
    t("cand+window+agg") { noop(scored) }
    t("full q17") {
      noop(graft.SparkEntry.queries("q17_item_knn_topk")(spark, dir))
    }
    t("full q17 again") {
      noop(graft.SparkEntry.queries("q17_item_knn_topk")(spark, dir))
    }
    // how many rows at each stage
    println("[q17prof] cand rows: " + cand.count())
    println("[q17prof] scored rows: " + scored.count())
    spark.stop()
  }
}
