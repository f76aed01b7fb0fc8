package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-14 diagnostic: trace WHY the shared kNN sims caches
  * (ratingsCached / userDotsCached / itemSimsCached) are sometimes not
  * reused across bench repeats — q17/q33 own-CPU floors read ~3× their
  * cache-hit cost on roughly half of full-suite repeats (both in the
  * committed r14 series and in this round's baseline). Runs the kNN
  * block for N repeats and, after every query, dumps the persistent-RDD
  * table (id, cached/total partitions, memory bytes) plus whether a
  * fresh itemSimsCached plan currently resolves to an InMemoryRelation.
  * Throwaway measurement tool — not part of any query path. */
object CacheTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = Seq("q16_user_knn_topk", "q16b_user_knn_dimsum",
      "q17_item_knn_topk", "q17b_item_knn_dimsum", "q33_hybrid_topk")
    val qs = graft.SparkEntry.queries
    def dumpCaches(tag: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      println(s"[cachetrace] $tag persistentRDDs=${infos.length}")
      infos.sortBy(_.id).foreach { i =>
        println(s"[cachetrace]   rdd=${i.id} cached=${i.numCachedPartitions}/${i.numPartitions} mem=${i.memSize} disk=${i.diskSize} name=${i.name.take(80)}")
      }
      val sims = graft.operators.Recommender.itemSimsCached(spark, sfDir)
      val resolved = sims.queryExecution.withCachedData.toString
      println(s"[cachetrace] $tag itemSims-plan-hits-cache=${resolved.contains("InMemoryRelation")}")
    }
    for (r <- 1 to 3; (n, i) <- names.zipWithIndex) {
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[cachetrace] repeat=$r q=$n wall=$w%.2f")
      dumpCaches(s"after r$r/$n")
    }
    spark.stop()
  }
}
