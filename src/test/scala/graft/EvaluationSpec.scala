package graft

import org.apache.spark.sql.functions._
import graft.operators.Evaluation

/** Hand-computed fixture for the E1-E3 ranking-metrics library
  * surface — pins the reference's AP@k quirk (EVERY prefix counted,
  * not only hit positions; divisor k) and the E2 empty-relevant
  * guard, independent of the oracle-checked q27 pipeline. */
class EvaluationSpec extends SparkSuite {

  test("rankingMetricsAt matches hand-computed P/R/AP@3") {
    val s = spark
    import s.implicits._
    // user 1: recs [10, 20, 30], relevant {10, 30, 99}
    //   hits at rk 1 and 3 → prec@3 = 2/3; recall = 2/3
    //   AP@3 (all-prefix) = (1/1 + 1/2 + 2/3) / 3 = 0.7222
    // user 2: recs [40, 50, 60], relevant {50}
    //   prec = 1/3; recall = 1; AP = (0/1 + 1/2 + 1/3) / 3 = 0.2778
    // user 3: recs [70, 80, 90], NO relevant pairs
    //   prec = 0; recall = 0 (E2 guard); AP = 0
    val recs = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 40L, 1), (2L, 50L, 2), (2L, 60L, 3),
      (3L, 70L, 1), (3L, 80L, 2), (3L, 90L, 3)
    ).toDF("user_id", "item_id", "rk")
    val rel = Seq((1L, 10L), (1L, 30L), (1L, 99L), (2L, 50L))
      .toDF("user_id", "item_id")

    val m = Evaluation.rankingMetricsAt(recs, rel, 3).collect()(0)
    val wantPrec = ((2.0 / 3) + (1.0 / 3) + 0.0) / 3
    val wantRec = ((2.0 / 3) + 1.0 + 0.0) / 3
    val wantMap = ((1.0 + 0.5 + 2.0 / 3) / 3 + (0.5 + 1.0 / 3) / 3 + 0.0) / 3
    assert(math.abs(m.getDouble(0) - wantPrec) < 5e-5, s"prec ${m.getDouble(0)}")
    assert(math.abs(m.getDouble(1) - wantRec) < 5e-5, s"rec ${m.getDouble(1)}")
    assert(math.abs(m.getDouble(2) - wantMap) < 5e-5, s"map ${m.getDouble(2)}")
  }

  test("compatUnorderedAp replays the reference's Set-order AP and diverges from the corrected ranked AP") {
    val s = spark
    import s.implicits._
    // one user, items 1..10 recommended in rank order, only item 1
    // relevant. The reference's _selected is a Set[Int]; Scala's
    // 10-element HashSet iterates 5,10,1,6,9,2,7,3,8,4 — item 1 sits
    // at SET position 3, not rank position 1. Pin the order first so
    // a JVM/collection change fails here, not in the math.
    val setOrder = (1 to 10).toSet.toList
    assert(setOrder == List(5, 10, 1, 6, 9, 2, 7, 3, 8, 4),
      s"HashSet iteration order changed: $setOrder")
    val recs = (1 to 10).map(i => (7L, i.toLong, i)).toDF("user_id", "item_id", "rk")
    val rel = Seq((7L, 1L)).toDF("user_id", "item_id")

    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    // corrected (rank order): hit at rank 1 → Σ_{i=1..10} 1/i / 10
    val correctedAp = r4((1 to 10).map(1.0 / _).sum / 10)
    // reference formula BY HAND off the pinned set order: item 1 is
    // the 3rd set element → prefixes of length ≥ 3 contain the hit
    val compatAp = r4((3 to 10).map(1.0 / _).sum / 10)
    assert(compatAp != correctedAp)

    val corrected = graft.operators.Evaluation.rankingMetricsAt(recs, rel, 10).head()
    val compat = graft.operators.Evaluation.rankingMetricsAt(recs, rel, 10,
      compatUnorderedAp = true).head()
    assert(corrected.getDouble(2) == correctedAp,
      s"corrected AP ${corrected.getDouble(2)} != $correctedAp")
    assert(compat.getDouble(2) == compatAp,
      s"compat AP ${compat.getDouble(2)} != $compatAp")
    // precision and recall are set intersections — identical either way
    assert(compat.getDouble(0) == corrected.getDouble(0))
    assert(compat.getDouble(1) == corrected.getDouble(1))
  }

  test("q96 NDCG matches a hand-rolled model on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.Evaluation.queries("q96_ndcg")(spark, dir).head()
    // hand-rolled: popularity top-10, binary gains, log2 discounts
    val r = graft.sources.Tables.ratingsCached(spark, dir)
      .select("user_id", "item_id", "rating").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    val pop = r.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (item, cnt) => (-cnt, item) }.take(10).map(_._1)
    val rel = r.filter(_._3 >= 30.0).map(t => (t._1, t._2)).toSet
    val users = r.map(_._1).distinct
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val ndcgs = users.map { u =>
      val dcg = pop.zipWithIndex.map { case (it, i) =>
        (if (rel((u, it))) 1.0 else 0.0) / log2(i + 2.0) }.sum
      val m = math.min(10, r.count(t => t._1 == u && t._3 >= 30.0))
      if (m == 0) 0.0
      else dcg / (1 to m).map(i => 1.0 / log2(i + 1.0)).sum
    }
    val want = ndcgs.sum / users.length
    assert(math.abs(got.getDouble(0) - want) < 5e-4,
      s"ndcg ${got.getDouble(0)} vs model $want")
    assert(got.getLong(1) == users.length.toLong)
    assert(got.getDouble(0) > 0.0 && got.getDouble(0) < 1.0)
  }

  test("q104 ALS contract row: facts match cohort, both verdicts green at sf0.001") {
    import org.apache.spark.sql.functions._
    val row = graft.SparkEntry.queries("q104_als_topk")(spark, "/root/testdata/sf0.001")
      .head()
    val nUsers = row.getLong(row.fieldIndex("n_users"))
    assert(nUsers > 0, "empty ALS cohort")
    assert(row.getInt(row.fieldIndex("k")) == Evaluation.ALS_K)
    assert(row.getLong(row.fieldIndex("n_rows")) == nUsers * Evaluation.ALS_K)
    assert(row.getInt(row.fieldIndex("complete_ok")) == 1,
      "a cohort user is missing rows or has rank gaps")
    // sf0.001 has a baked ALS_DIGESTS entry — the digest must match it
    // (this is the same verdict the driver's oracle pins to 1 at sf0.01)
    assert(row.getInt(row.fieldIndex("digest_ok")) == 1,
      "6-dp readout digest drifted from the baked literal — rerun " +
        "tools/AlsDeterminism and re-bake if the testdata changed")
    // the facts agree with an independent cohort count
    val cohort = graft.sources.Tables.ratings(spark, "/root/testdata/sf0.001")
      .select(col("user_id")).distinct()
      .filter(col("user_id") % Evaluation.ALS_COHORT_MOD === 0).count()
    assert(nUsers == cohort, s"n_users $nUsers != cohort $cohort")
  }

  test("ALS readout itself: k rows per user, rank-ordered descending scores") {
    import org.apache.spark.sql.functions._
    val ratings = graft.sources.Tables.ratingsCached(spark, "/root/testdata/sf0.001")
    val model = new graft.ml.AlsRecommender()
      .setRank(10).setMaxIter(10).setSeed(42L).setKItems(Evaluation.ALS_K)
      .fit(ratings)
    val cohort = ratings.select(col("user_id")).distinct()
      .filter(col("user_id") % Evaluation.ALS_COHORT_MOD === 0)
    val rows = model.transform(cohort)
      .select(col("user_id"), col("item_id"), col("rk"), col("score"))
      .collect()
    assert(rows.nonEmpty, "empty ALS readout")
    val perUser = rows.groupBy(_.getLong(0))
    assert(perUser.forall(_._2.length == Evaluation.ALS_K),
      "a cohort user is missing rows")
    perUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to Evaluation.ALS_K), s"user $u ranks")
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse, s"user $u scores not descending")
    }
  }
}
