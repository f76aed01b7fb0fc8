package graft

import org.apache.spark.sql.functions._
import graft.operators.{SeqRecommender, Sequential}

/** Unit guards for the composed sequential recommender's stages (the
  * end-to-end pipeline is oracle-checked as q58). */
class SeqRecommenderSpec extends SparkSuite {

  test("sparse Lloyd separates two obvious basket groups deterministically") {
    val s = spark
    import s.implicits._
    // two disjoint item neighborhoods; seeds = the 2 smallest t_ids,
    // one in each group by construction
    val titems = Seq(
      (1L, 1L), (1L, 2L),
      (2L, 8L), (2L, 9L),
      (3L, 1L), (3L, 2L), (3L, 3L),
      (4L, 8L), (4L, 9L), (4L, 10L)
    ).toDF("t_id", "item_id")
    val got = SeqRecommender.clusterTransactionsSparse(titems, numSeeds = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 3L -> 1L, 2L -> 2L, 4L -> 2L))
    // deterministic: a second run returns the identical assignment
    val again = SeqRecommender.clusterTransactionsSparse(titems, numSeeds = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == got)
  }

  test("mineSeqRules keeps period-0 consequents, strips antecedents, recounts") {
    val s = spark
    import s.implicits._
    // 8 users hold {A_-1, B_0}, one holds only {A_-1}, one {C_-3}:
    // minCount = ceil(max(0.005, 4/10)·10) = 4, so A_-1 (9), B_0 (8)
    // and the pair (8) are frequent. A_-1→B_0 survives (conf 8/9);
    // B_0→A_-1 dies on the consequent-period filter.
    val baskets = (
      (1 to 8).map(u => (u.toLong, Seq("A_-1", "B_0"))) ++
        Seq((9L, Seq("A_-1")), (10L, Seq("C_-3")))
      ).toDF("user_id", "items")
    val got = SeqRecommender.mineSeqRules(baskets, nBaskets = 10L)
      .collect().map(r => (r.getSeq[String](0), r.getString(1),
        r.getDouble(2), r.getDouble(3)))
    assert(got.length == 1)
    val (ant, cons, sup, conf) = got.head
    assert(ant == Seq("A_-1") && cons == "B_0")
    assert(sup == 0.8 && conf == 0.888889)
  }

  test("q58 recommends unseen items only, at most 5 per user") {
    val dir = "/root/testdata/sf0.001"
    val res = SparkEntry.queries("q58_seq_recommend")(spark, dir)
    val seen = SeqRecommender.transactions(spark, dir)
      .select("user_id", "item_id").distinct()
    assert(res.join(seen, Seq("user_id", "item_id")).count() == 0)
    assert(res.groupBy("user_id").count().filter(col("count") > 5).count() == 0)
  }

  test("SequentialRecommender estimator output equals the q58 operator path") {
    val dir = "/root/testdata/sf0.001"
    val trans = SeqRecommender.transactions(spark, dir).cache()
    val titems = trans.select("t_id", "item_id")
    val assigned = SeqRecommender.clusterTransactionsSparse(
      titems, SeqRecommender.NUM_CLUSTERS, SeqRecommender.KMEANS_ITERS).cache()
    val operator = SeqRecommender.recommendFrom(trans, assigned)
      .collect().map(_.toSeq).toSet
    assert(operator.nonEmpty, "fixture must produce recommendations")

    val model = new graft.ml.SequentialRecommender().fit(trans)
    val allUsers = trans.select("user_id").distinct()
    val estimator = model.recommendDetailed(allUsers)
      .collect().map(_.toSeq).toSet
    assert(estimator == operator,
      "estimator fit/transform must replay the operator pipeline exactly")

    // a cohort transform equals the full run filtered (per-user
    // independence of the scoring stage)
    val someUsers = allUsers.orderBy("user_id").limit(7)
    val cohortIds = someUsers.collect().map(_.getLong(0)).toSet
    val cohort = model.recommendDetailed(someUsers).collect().map(_.toSeq).toSet
    assert(cohort == operator.filter(r => cohortIds(r.head.asInstanceOf[Long])))
    trans.unpersist(); assigned.unpersist()
  }

  test("estimator period modes: explicit ranges replay the operator arithmetic; duration/count modes bucket and clamp like the reference") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val o = graft.sources.Tables.orders(spark, dir)
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    // the operator path's transactions, with the raw timestamp instead
    // of a pre-bucketed period_id
    val tsTrans = o
      .select(col("o_orderkey").as("t_id"), col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").as("timestamp"))
      .join(li, col("t_id") === col("l_orderkey"))
      .select(col("t_id"), col("user_id"), col("timestamp"),
        col("l_partkey").as("item_id"))
      .distinct().cache()
    val operatorTrans = SeqRecommender.transactions(spark, dir).cache()

    // mode 1 — explicit ranges built from the SAME q28/q46 bounds the
    // operator path derives: assignment must replay it exactly
    val b = Sequential.periodBounds(o)
      .select(date_format(col("dmin"), "yyyy-MM-dd").as("dmin"),
        date_format(col("dmax"), "yyyy-MM-dd").as("dmax"), col("width"))
      .collect()(0)
    val (dmin, dmax, width) =
      (java.time.LocalDate.parse(b.getString(0)),
        java.time.LocalDate.parse(b.getString(1)), b.getLong(2))
    val ranges = (0L until Sequential.NUM_PERIODS.toLong).map { k =>
      val s = dmin.plusDays(k * width)
      val e = if (k == Sequential.NUM_PERIODS - 1) dmax.plusDays(1)
              else dmin.plusDays((k + 1) * width)
      (k, s.toString + " 00:00:00", e.toString + " 00:00:00")
    }
    val est = new graft.ml.SequentialRecommender().setPeriodRanges(ranges)
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("t_id", "item_id", "period_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val modelRanges = est.fit(tsTrans)
    assert(keyed(modelRanges.trans) == keyed(operatorTrans),
      "ranges-mode assignment must equal the operator's q28 arithmetic")
    val baseline = new graft.ml.SequentialRecommender().fit(operatorTrans)
    val allUsers = operatorTrans.select("user_id").distinct()
    assert(modelRanges.recommendDetailed(allUsers).collect().map(_.toSeq).toSet
      == baseline.recommendDetailed(allUsers).collect().map(_.toSeq).toSet,
      "ranges-mode recommendations must equal the pre-bucketed path")

    // default-to-last rule: a timestamp outside every range lands in
    // the LAST range (reference :289-296)
    val stray = spark.createDataFrame(Seq(
      (999001L, 1L, java.sql.Timestamp.valueOf("1970-01-05 00:00:00"), 42L)))
      .toDF("t_id", "user_id", "timestamp", "item_id")
    val strayPid = SeqRecommender
      .assignPeriodsFromRanges(stray, ranges.map { case (id, s, e) =>
        (id, java.sql.Timestamp.valueOf(s), java.sql.Timestamp.valueOf(e)) })
      .collect()(0).getAs[Long]("period_id")
    assert(strayPid == Sequential.NUM_PERIODS - 1L,
      s"unmatched timestamp must take the last period, got $strayPid")

    // null timestamps DROP uniformly in all three modes (they must
    // not fall through the ranges default-to-last arm)
    val withNull = spark.createDataFrame(Seq(
      (999002L, 1L, Option.empty[java.sql.Timestamp], 43L),
      (999003L, 1L,
        Some(java.sql.Timestamp.valueOf("1995-06-01 00:00:00")), 44L)))
      .toDF("t_id", "user_id", "timestamp", "item_id")
    val nullOut = SeqRecommender
      .assignPeriodsFromRanges(withNull, ranges.map { case (id, s, e) =>
        (id, java.sql.Timestamp.valueOf(s), java.sql.Timestamp.valueOf(e)) })
      .select("t_id").collect().map(_.getLong(0)).toSet
    assert(nullOut == Set(999003L),
      s"null-timestamp row must drop in ranges mode: $nullOut")

    // mode 2 — duration windows: dense time-ordered ids over the
    // observed epoch-aligned windows (W3 discipline, no m.i.id)
    val fix = spark.createDataFrame(Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L),
      (2L, 1L, java.sql.Timestamp.valueOf("2024-01-09 12:00:00"), 11L),
      (3L, 2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 12L),
      (4L, 2L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 13L)))
      .toDF("t_id", "user_id", "timestamp", "item_id")
    val byDur = SeqRecommender.assignPeriodsFromDuration(fix, "7 days")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("period_id")).toMap
    // three distinct 7-day windows observed → ids 0,1,2 in time order;
    // t1 and t3 share the first window
    assert(byDur(1L) == byDur(3L) && byDur(1L) == 0L)
    assert(byDur(2L) == 1L && byDur(4L) == 2L, s"dense ordered ids: $byDur")

    // a null timestamp must drop WITHOUT shifting the dense ids: an
    // unfiltered window(null) would enter the period dimension as a
    // null _pw and (NULLS FIRST) steal period_id 0 from t1/t3
    val fixNull = fix.union(spark.createDataFrame(Seq(
      (5L, 3L, Option.empty[java.sql.Timestamp], 14L)))
      .toDF("t_id", "user_id", "timestamp", "item_id"))
    val byDurNull = SeqRecommender.assignPeriodsFromDuration(fixNull, "7 days")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("period_id")).toMap
    assert(byDurNull == byDur,
      s"null ts must drop without shifting duration-mode ids: $byDurNull")

    // mode 3 — target count: span 31 days / n=3 → 10-day windows, and
    // any window past n-1 clamps to n-1 (reference :374-384)
    val byCnt = SeqRecommender.assignPeriodsFromCount(fix, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("period_id")).toMap
    assert(byCnt.values.max == 2L && byCnt.values.min == 0L,
      s"count mode must span exactly [0, n-1]: $byCnt")
    assert(byCnt(4L) == 2L, "the tail transaction must clamp to the last period")
    val byCntNull = SeqRecommender.assignPeriodsFromCount(fixNull, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("period_id")).toMap
    assert(byCntNull == byCnt,
      s"null ts must drop without shifting count-mode ids/clamp: $byCntNull")

    // the three modes drive the SAME fit: duration-mode fit on the
    // fixture runs end to end and matches its own pre-bucketed twin
    val durFit = new graft.ml.SequentialRecommender().setPeriodDuration("7 days")
      .fit(fix)
    val preFit = new graft.ml.SequentialRecommender()
      .fit(SeqRecommender.assignPeriodsFromDuration(fix, "7 days")
        .drop("timestamp"))
    val fixUsers = fix.select("user_id").distinct()
    assert(durFit.recommendDetailed(fixUsers).collect().map(_.toSeq).toSet
      == preFit.recommendDetailed(fixUsers).collect().map(_.toSeq).toSet)
    tsTrans.unpersist(); operatorTrans.unpersist()
  }
}
