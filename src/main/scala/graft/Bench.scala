package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  *
  * Each query is forced through a `noop`-format write so every
  * expression actually executes — a bare `count()` lets Catalyst
  * collapse pure projections to a row count and times the wrong plan.
  * Failures are recorded per query (value -1, message in "errors")
  * instead of being swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores TIMESTAMP(NANOS); session-wide, set once
      // (see graft.sources.Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // a 48g heap sees almost no GC, so ContextCleaner never learns
      // that early queries' RDDs died — shuffle files from 100+
      // queries pile up on local disk and the late heavy joins go
      // IO-bound. Aggressive periodic GC keeps the shuffle dir pruned.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                  case c if c < ' ' => " "; case c => c.toString }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // sorted order: run-to-run comparability (Map hash order reshuffles
    // whenever a query is added, moving shared-cache build costs
    // between queries); GC nudge every 8 queries lets ContextCleaner
    // drop dead shuffle files promptly
    val results = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((name, fn), i) =>
      if (i % 8 == 7) System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // "value" deliberately LAST: the driver keeps only the tail bytes
    // of sbt output, so trailing keys survive truncation (JSON key
    // order is semantically free)
    println(s"""{"metric":"total","unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","value":$total}""")
    spark.stop()
  }
}
