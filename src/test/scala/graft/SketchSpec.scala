package graft

/** Sketch-aggregate sanity. The approx queries now carry their own
  * oracle-checkable tolerance contract (exact columns + pinned `ok`
  * verdicts — see q05b's Scaladoc); these specs keep the sharper
  * bounds the 1-bit verdict flattens: rank brackets for the
  * percentile sketch and bit-exact mergeability for the HLL rollup. */
class SketchSpec extends SparkSuite {

  test("q53b: exact columns match percentile(), verdicts all 1, approx inside exact rank brackets") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q53b_approx_percentiles")(spark, dir).collect()
    // the contract's verdict columns must read 1 (the oracle pins them)
    for (r <- rows; i <- 5 to 7)
      assert(r.getInt(i) == 1, s"verdict column $i not 1: $r")
    // sharper-than-5% guarantee: the sketch bounds RANK error (a heavy
    // tail makes adjacent order statistics arbitrarily far apart in
    // value) — each approx quantile must lie between the exact
    // quantiles ±2% of rank around its target
    val approx = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 10000)").as("a50"),
        expr("approx_percentile(value, 0.9, 10000)").as("a90"),
        expr("approx_percentile(value, 0.99, 10000)").as("a99"))
      .collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val brackets = Seq((0.5, 0.48, 0.52), (0.9, 0.88, 0.92), (0.99, 0.97, 1.0))
    val exprCols = brackets.flatMap { case (_, lo, hi) =>
      Seq(s"percentile(value, $lo)", s"percentile(value, $hi)") }
    val exact = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr(exprCols.head).as("c0"),
        exprCols.tail.zipWithIndex.map { case (e, i) =>
          expr(e).as(s"c${i + 1}") }: _*)
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

  test("HLL sketch rollup: verdicts all 1 at sf0.01, merged daily sketches == direct sketch (bit-exact mergeability)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q102_sketch_rollup")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(3) == 1, s"sketch out of tolerance: $r"))
    val ev = graft.sources.Tables.events(spark, dir)
    // mergeability: union of daily sketches == sketching the raw facts
    val daily = ev
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    direct.foreach { case (t, d) =>
      assert(daily(t) == d, s"$t: merged-daily ${daily(t)} != direct-sketch $d")
    }
  }
}
