package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for VERDICT r9 next #1: attribute q33's floor
  * step (committed reference 11.3 s, driver regen 25.5 s — both under
  * ambient contamination). Hypothesis to TEST, not assume: the 21
  * round-9 queries (q106b…q126) enter the bench's sorted order before
  * q33 and change the session state q33 runs in (resident caches /
  * storage-pool pressure / shuffle-file population), raising its
  * in-series floor. The band explanation predicts instead that q33
  * reads ~11 s whenever the host is quiet, regardless of prefix.
  *
  * Method (one JVM, the bench's exact session config):
  *   A. run the full 133-suite sorted prefix before q33, then q33 ×3
  *   B. clearCache(), run the r8-era prefix (the same minus the 21
  *      round-9 names), then q33 ×3
  *   C. clearCache(), run only q33's cache builders (q16, q17), then
  *      q33 ×3   — the isolated-warm baseline
  * Per q33 run: wall, own-CPU, host-CPU and host load; before each
  * block: cached-RDD count and memory. Decision rule (the project's
  * regression signature): A ≈ B ≈ C ≈ committed floor → the driver
  * series' 25.5 s was band; A ≫ B → the round-9 prefix is the cause;
  * A ≈ B ≫ C → an older structural in-series cost, not round 9.
  */
object Q33Probe {
  // the 21 round-9 additions, all sorted before q33 in bench order
  val R9_NAMES: Set[String] = Set(
    "q106b_ccnet_calibrated", "q108b_chunk_keep", "q109_pii_scrub",
    "q110_dsir_weights", "q111_blocklist", "q112_mm_features",
    "q113_cluster_balance", "q114_bpe_train", "q115_bpe_encode",
    "q116_quality_classifier", "q117_dup_spans", "q117b_span_scrub",
    "q118_ewma", "q119_shard_plan", "q120_mm_frames", "q121_mm_resize",
    "q122_ngram_diversity", "q123_zipf_fit", "q124_split_contamination",
    "q125_training_manifest", "q126_dedup_impact")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q33Reps = sys.env.getOrElse("SPARK_GRAFT_Q33_REPS", "3").toInt
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
    val sc = spark.sparkContext
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    def ownCpuS(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    def hostBusyS(): Double =
      try {
        val v = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat"))
          .linesIterator.next().split("\\s+").drop(1).map(_.toLong)
        (v(0) + v(1) + v(2) + v(5) + v(6)) / 100.0
      } catch { case _: Throwable => -1.0 }
    def load(): String =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split("\\s+")(0)
      catch { case _: Throwable => "?" }

    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val q33 = all.find(_._1 == "q33_hybrid_topk").get._2
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, dir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        println(s"[q33probe] $name ERROR ${Option(e.getMessage).getOrElse("?").take(120)}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    def storage(): String = {
      val infos = sc.getRDDStorageInfo
      s"rdds=${infos.length} cachedMem=${f1(infos.map(_.memSize).sum / 1e6)}MB"
    }
    def q33Block(tag: String): Unit = {
      println(s"[q33probe] $tag pre-q33 storage: ${storage()} load=${load()}")
      for (i <- 1 to q33Reps) {
        if (i % 2 == 0) System.gc()
        val (c0, h0) = (ownCpuS(), hostBusyS())
        val w = run("q33", q33)
        val (c1, h1) = (ownCpuS(), hostBusyS())
        println(s"[q33probe] $tag q33 rep=$i wall=${f1(w)}s own_cpu=${f1(c1 - c0)}s " +
          s"host_cpu=${f1(h1 - h0)}s ext_cpu=${f1((h1 - h0) - (c1 - c0))}s load=${load()}")
      }
    }
    def prefix(tag: String, names: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]): Unit = {
      val t0 = System.nanoTime()
      names.zipWithIndex.foreach { case ((n, fn), i) =>
        if (i % 6 == 5) System.gc()
        run(n, fn)
      }
      println(s"[q33probe] $tag prefix ${names.size} queries in " +
        s"${f1((System.nanoTime() - t0) / 1e9)}s, ${storage()}")
    }

    val pre = all.takeWhile(_._1 != "q33_hybrid_topk")
    println(s"[q33probe] sf=$dir load=${load()} prefixA=${pre.size} " +
      s"prefixB=${pre.count(p => !R9_NAMES(p._1))} reps=$q33Reps")

    prefix("A(full-133-prefix)", pre)
    q33Block("A(full-133-prefix)")

    spark.catalog.clearCache()
    System.gc()
    prefix("B(r8-era-prefix)", pre.filterNot(p => R9_NAMES(p._1)))
    q33Block("B(r8-era-prefix)")

    spark.catalog.clearCache()
    System.gc()
    prefix("C(builders-only)", all.filter(p =>
      p._1 == "q16_user_knn_topk" || p._1 == "q17_item_knn_topk"))
    q33Block("C(builders-only)")

    spark.stop()
  }
}
