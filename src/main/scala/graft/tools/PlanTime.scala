package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * Diagnostic: split a registered query's wall time into Catalyst
 * analysis/optimization/physical-planning vs actual execution.
 *
 * The composed queries (q33 hybrid, q100 corpus pipeline, q58
 * sequential) cost 10-18 s at sf0.001 where the DATA is trivially
 * small — if that floor is planning (single-threaded driver work on a
 * plan tree that fuses several kNN pipelines), it both (a) sets the
 * per-query bench floor at every SF and (b) explains why these
 * queries inflate disproportionately under host CPU contention.
 *
 * Usage: runMain graft.tools.PlanTime <sfDir> <query...>
 * Prints per query: plan_s (first call to executedPlan) and exec_s
 * (noop write of the SAME DataFrame, planning already done).
 */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
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
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Untimed session warmup: the first job in a fresh JVM pays several
    // seconds of one-off cost (executor thread spin-up, codegen
    // compiler warmup, shuffle-system init) that a bench-context query
    // never sees — without this, a fresh-JVM PlanTime over-attributes
    // that constant to whichever query runs first (measured ~5 s of
    // q58's "build" at sf0.001).
    spark.range(1L << 20).repartition(32).groupBy((col("id") % 97).as("k"))
      .count().write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analyze+optimize+plan
      val t2 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t3 = System.nanoTime()
      println(s"[plantime] $n build=${f3((t1 - t0) / 1e9)}s " +
        s"plan=${f3((t2 - t1) / 1e9)}s exec=${f3((t3 - t2) / 1e9)}s")
    }
    spark.stop()
  }
}
