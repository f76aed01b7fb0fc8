package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.operators.Recommender

/** Scratch diagnostic (r15): piecewise wall split of q16's warm path. */
object Q16Profile {
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
      println(f"[q16prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    val r = Tables.ratingsCached(spark, dir)
    val dots = Recommender.userDotsCached(spark, dir)
    t("build dots cache") { noop(dots) }
    t("dots scan again") { noop(dots) }
    val full = dots.union(dots.select(col("v").as("u"), col("u").as("v"),
      col("dot"), col("co")))
    t("mirror scan") { noop(full) }
    // q16 full twice
    t("full q16") { noop(graft.SparkEntry.queries("q16_user_knn_topk")(spark, dir)) }
    t("full q16 again") { noop(graft.SparkEntry.queries("q16_user_knn_topk")(spark, dir)) }
    t("full q59") { noop(graft.SparkEntry.queries("q59_user_knn_pearson")(spark, dir)) }
    t("full q59 again") { noop(graft.SparkEntry.queries("q59_user_knn_pearson")(spark, dir)) }
    t("full q63 again") { noop(graft.SparkEntry.queries("q63_user_knn_euclidean")(spark, dir)) }
    t("full q30") { noop(graft.SparkEntry.queries("q30_user_rating_predict")(spark, dir)) }
    println("[q16prof] dots rows: " + dots.count())
    spark.stop()
  }
}
