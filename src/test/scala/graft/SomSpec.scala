package graft

import org.apache.spark.sql.functions._
import graft.ml.SOM
import graft.operators.SeqRecommender

/** The SOM estimator (reference SequentialTopKRecommender.scala:403-416
  * surface): deterministic fit/transform, topology sanity, and the
  * sequential pipeline running with the SOM swapped in for the sparse
  * Lloyd clusterer. */
class SomSpec extends SparkSuite {

  test("SOM separates two obvious clusters; assignments deterministic") {
    val s = spark
    import s.implicits._
    val pts = Seq(
      (1L, Seq(0.1, 0.1)), (2L, Seq(0.15, 0.05)), (3L, Seq(0.05, 0.2)),
      (4L, Seq(0.9, 0.9)), (5L, Seq(0.85, 0.95)), (6L, Seq(0.95, 0.8))
    ).toDF("id", "features")

    def run(): Map[Long, Int] = {
      val model = new SOM().setHeight(1).setWidth(2).setMaxIter(5).setSeed(42L)
        .setFeaturesCol("features").setPredictionCol("cluster")
        .fit(pts)
      model.transform(pts).select("id", "cluster")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    }
    val got = run()
    val lo = Set(1L, 2L, 3L).map(got)
    val hi = Set(4L, 5L, 6L).map(got)
    assert(lo.size == 1 && hi.size == 1 && lo != hi,
      s"expected a clean 2-way split, got $got")
    assert(run() == got) // same seed, same data → same map
  }

  test("SOM grid dims and weights have the declared shape") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, Seq(0.2, 0.4, 0.6))).toDF("id", "features")
    val m = new SOM().setHeight(2).setWidth(3).setMaxIter(1).fit(pts)
    assert(m.weights.length == 6)
    assert(m.weights.forall(_.length == 3))
  }

  test("sequential pipeline runs with the SOM clusterer swapped in") {
    val dir = "/root/testdata/sf0.001"
    val trans = SeqRecommender.transactions(spark, dir).cache()
    val titems = trans.select("t_id", "item_id")
    // densify baskets over the (tiny at this sf) catalog — the SOM
    // surface is vector-in like the reference's; the sparse Lloyd path
    // stays the scale default
    val catalog = titems.select("item_id").distinct().orderBy("item_id")
      .collect().map(_.getLong(0))
    val feats = titems.groupBy("t_id").agg(collect_set(col("item_id")).as("is"))
      .select(col("t_id"), array(catalog.map(i =>
        when(array_contains(col("is"), i), 1.0).otherwise(0.0)): _*).as("features"))
    val model = new SOM().setHeight(2).setWidth(4).setMaxIter(2).setSeed(42L)
      .fit(feats)
    val assigned = model.transform(feats)
      .select(col("t_id"), col("prediction").cast("long").as("cluster"))
    val recs = SeqRecommender.recommendFrom(trans, assigned).cache()
    assert(recs.count() > 0)
    val seen = trans.select("user_id", "item_id").distinct()
    assert(recs.join(seen, Seq("user_id", "item_id")).count() == 0)

    // SOM↔Lloyd parity through the SAME seam: the survey-sanctioned
    // sparse-Lloyd default (q58's oracle-checked path) and the real
    // batch SOM are interchangeable behind recommendFrom — identical
    // output contract (schema, ≤5 per user, unseen-only already
    // asserted above), and the SOM arm is deterministic: a full
    // refit + re-transform reproduces every assignment and every
    // recommendation bit-for-bit (seed-fixed init, single-action
    // epochs — nothing in the pipeline depends on partitioning).
    val lloydRecs = SparkEntry.queries("q58_seq_recommend")(spark, dir)
    assert(recs.schema == lloydRecs.schema,
      s"seam output contract drifted: ${recs.schema} vs ${lloydRecs.schema}")
    val perUser = recs.groupBy("user_id").count()
      .agg(max(col("count"))).head().getLong(0)
    assert(perUser <= 5, s"more than 5 recs per user: $perUser")

    val model2 = new SOM().setHeight(2).setWidth(4).setMaxIter(2).setSeed(42L)
      .fit(feats)
    val assigned2 = model2.transform(feats)
      .select(col("t_id"), col("prediction").cast("long").as("cluster"))
    assert(assigned.except(assigned2).isEmpty && assigned2.except(assigned).isEmpty,
      "SOM assignments must be deterministic across refits")
    val recs2 = SeqRecommender.recommendFrom(trans, assigned2)
    assert(recs.except(recs2).isEmpty && recs2.except(recs).isEmpty,
      "SOM-clustered recommendations must be deterministic across refits")
  }
}
