package graft

/** Sketch-aggregate sanity: the shape-gated approximate queries (no
  * SQL oracle possible) stay close to their exact twins. */
class SketchSpec extends SparkSuite {

  test("q53b approx percentiles fall inside exact rank brackets") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("q53b_approx_percentiles")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // the sketch guarantee is on RANK error, not value error (a heavy
    // tail makes adjacent order statistics arbitrarily far apart in
    // value) — so assert each approx quantile lies between the exact
    // quantiles ±2% of rank around its target
    val brackets = Seq((0.5, 0.48, 0.52), (0.9, 0.88, 0.92), (0.99, 0.97, 1.0))
    val exprCols = brackets.flatMap { case (_, lo, hi) =>
      Seq(s"percentile(value, $lo)", s"percentile(value, $hi)") }
    val exact = graft.sources.Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.expr(exprCols.head).as("c0"),
        exprCols.tail.zipWithIndex.map { case (e, i) =>
          org.apache.spark.sql.functions.expr(e).as(s"c${i + 1}") }: _*)
      .collect()
      .map(r => r.getString(0) -> (1 to 6).map(i => r.getDouble(i)))
      .toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    for ((t, as) <- approx; (a, idx) <- as.zipWithIndex) {
      val lo = exact(t)(idx * 2)
      val hi = exact(t)(idx * 2 + 1)
      assert(a >= lo - 1e-4 && a <= hi + 1e-4,
        s"$t p${brackets(idx)._1}: approx $a outside exact bracket [$lo, $hi]")
    }
  }

  test("HLL sketch rollup: merged daily sketches track exact distincts within 5%") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("q102_sketch_rollup")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.sources.Tables.events(spark, dir)
    val exactPer = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.agg(countDistinct(col("user_id"))).head.getLong(0)
    (exactPer + ("<all>" -> exactAll)).foreach { case (t, exact) =>
      val a = got(t).toDouble
      assert(math.abs(a - exact) <= math.max(1.0, 0.05 * exact),
        s"$t: sketch $a vs exact $exact")
    }
    // mergeability: union of daily sketches == sketching the raw facts
    val direct = ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (t, d) =>
      assert(got(t) == d, s"$t: merged-daily ${got(t)} != direct-sketch $d")
    }
  }
}
