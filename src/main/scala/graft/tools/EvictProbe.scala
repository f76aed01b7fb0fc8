package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic for VERDICT r8 next #6: WHY does q17's in-series
  * wall (12.9–21 s floors inside a full bench repeat) sit far above
  * its isolated ~7 s floor? Hypothesis to test, not assume: a
  * neighboring query's caches evict `itemSimsCached` (the q32 LRU
  * lesson at bench scope), so in-series q17 rebuilds what isolated
  * q17 reuses.
  *
  * Method: run the bench's exact alphabetical query order, and after
  * EVERY query snapshot `sc.getRDDStorageInfo` — per cached RDD: id,
  * cached/total partitions, memory bytes. Any RDD that LOSES cached
  * partitions between snapshots is being evicted, and the query that
  * ran in between is the evictor. Two repeats: repeat 1 shows builds,
  * repeat 2 shows which caches survived a full suite pass and which
  * queries rebuild. Per-query walls print alongside so the cost of
  * each eviction is visible directly.
  *
  * Scoped to `SPARK_GRAFT_BENCH_ONLY`-style filtering via args:
  * `EvictProbe <sfDir> [nameFilter...]` runs the full suite when no
  * filter is given.
  */
object EvictProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_EVICT_REPEATS", "2").toInt
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
    def f1(v: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    def mb(b: Long): String = f1(b / 1e6) + "MB"

    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    // (id -> (name, cachedParts, totalParts, memSize))
    def snap(): Map[Int, (String, Int, Int, Long)] =
      sc.getRDDStorageInfo.map(i =>
        i.id -> (Option(i.name).getOrElse("?").replaceAll("\\s+", " ").take(70),
          i.numCachedPartitions, i.numPartitions, i.memSize)).toMap

    var prev = snap()
    val mem0 = sc.getExecutorMemoryStatus.values.map(_._1).sum
    println(s"[evict] storage pool total=${mb(mem0)}")
    for (r <- 1 to repeats; ((name, fn), i) <- names.zipWithIndex) {
      if (i % 6 == 5) System.gc()
      val t0 = System.nanoTime()
      try fn(spark, dir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        println(s"[evict] rep=$r $name ERROR ${Option(e.getMessage).getOrElse("?").take(120)}")
      }
      val w = (System.nanoTime() - t0) / 1e9
      val cur = snap()
      val lost = prev.toSeq.flatMap { case (id, (nm, c0, t, m0)) =>
        cur.get(id) match {
          case Some((_, c1, _, m1)) if c1 < c0 =>
            Some(s"id=$id '$nm' $c0/$t->$c1/$t mem ${mb(m0)}->${mb(m1)}")
          case None if c0 > 0 =>
            Some(s"id=$id '$nm' $c0/$t->GONE (was ${mb(m0)})")
          case _ => None
        }
      }
      val added = cur.toSeq.flatMap { case (id, (nm, c1, t, m1)) =>
        prev.get(id) match {
          case None if m1 > 0 => Some(s"id=$id '$nm' $c1/$t ${mb(m1)}")
          case Some((_, c0, _, _)) if c1 > c0 && !prev.contains(id) => None
          case _ => None
        }
      }
      val totalMem = cur.values.map(_._4).sum
      println(s"[evict] rep=$r ${f1(w)}s $name cachedMem=${mb(totalMem)} rdds=${cur.size}")
      lost.foreach(l => println(s"[evict]   LOST  $l  (during $name)"))
      added.foreach(a => println(s"[evict]   added $a"))
      prev = cur
    }
    spark.stop()
  }
}
