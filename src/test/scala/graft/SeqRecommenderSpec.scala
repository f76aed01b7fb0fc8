package graft

import org.apache.spark.sql.functions._
import graft.operators.SeqRecommender

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
}
