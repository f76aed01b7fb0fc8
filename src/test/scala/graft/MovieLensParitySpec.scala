package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Recommender

/** End-to-end parity on the REFERENCE'S OWN data: the MovieLens-100k
  * fold-1 train/test TSVs from /root/reference/data (read-only
  * inputs — the exact files the reference's CV harness consumes,
  * Main.scala:61-126). Proves a reference user can point this library
  * at their existing files and run the flagship workload: TSV ingest →
  * user-kNN predictions scored against the held-out fold. */
class MovieLensParitySpec extends SparkSuite {

  private val TRAIN1 = "/root/reference/data/train-fold1.csv"
  private val TEST1 = "/root/reference/data/test-fold1.csv"

  /** Cancel (don't fail) on machines without the reference checkout. */
  private def requireData(): Unit =
    assume(new java.io.File(TRAIN1).exists(),
      s"reference dataset not present at $TRAIN1")

  test("fold-1 user-kNN predictions hit sane MovieLens accuracy") {
    requireData()
    val s = spark
    val train = Tables.ratingsTsv(s, TRAIN1)
      .select(col("user_id"), col("item_id"), col("rating"))
    val test = Tables.ratingsTsv(s, TEST1)
    assert(train.count() == 80000L)
    assert(test.count() == 20000L)

    val preds = Recommender.userPredictOn(train,
      test.select(col("user_id").as("u"), col("item_id"),
        col("rating").as("actual")),
      kNeighbors = 25).cache()

    val n = preds.count()
    assert(n > 18000L, s"coverage too low: $n of 20000 test pairs") // items unseen in train drop out
    val row = preds.agg(
      sqrt(avg(pow(col("actual") - col("predicted"), 2))).as("rmse"),
      avg(abs(col("actual") - col("predicted"))).as("mae")).collect()(0)
    val (rmse, mae) = (row.getDouble(0), row.getDouble(1))
    // mean-centered cosine user-kNN (k=25) lands near 1.0 RMSE on
    // ML-100k; the band catches both broken formulas and leakage
    assert(rmse > 0.7 && rmse < 1.2, s"RMSE $rmse outside sane band")
    assert(mae > 0.5 && mae < 1.0, s"MAE $mae outside sane band")
  }

  test("fold-1 item-kNN predictions hit sane MovieLens accuracy") {
    requireData()
    val s = spark
    val train = Tables.ratingsTsv(s, TRAIN1)
      .select(col("user_id"), col("item_id"), col("rating"))
    val test = Tables.ratingsTsv(s, TEST1)
    val preds = Recommender.itemPredictOn(train,
      test.select(col("user_id").as("u"), col("item_id").as("i"),
        col("rating").as("actual")),
      kNeighbors = 25).cache()
    assert(preds.count() > 18000L)
    val rmse = preds.agg(
      sqrt(avg(pow(col("actual") - col("predicted"), 2)))).collect()(0).getDouble(0)
    assert(rmse > 0.7 && rmse < 1.3, s"item-kNN RMSE $rmse outside sane band")
  }

  test("fold-1 content-based top-K runs on the reference's genre features") {
    requireData()
    val s = spark
    val train = Tables.ratingsTsv(s, TRAIN1)
      .select(col("user_id"), col("item_id"), col("rating"))
    // R6: assemble the 19 genre flags into feature vectors
    val raw = Tables.featuresCsv(s, "/root/reference/data/features.csv")
    val feats = raw.select(col("id").as("item_id"),
      array(raw.columns.filter(_ != "id").map(c => col(c).cast("double")): _*)
        .as("fv"))
    val recs = graft.operators.Content.contentTopK(train, feats,
      col("user_id") <= 10, kNeighbors = 8, kItems = 5)
    assert(recs.count() == 50L) // 10 users × top-5
    assert(recs.join(train, Seq("user_id", "item_id")).count() == 0L)
  }

  test("fold-1 hybrid fusion runs the reference's fourth harness shape") {
    requireData()
    val s = spark
    val train = Tables.ratingsTsv(s, TRAIN1)
      .select(col("user_id"), col("item_id"), col("rating"))
    val cohort = col("user_id") <= 10
    val ua = Recommender.userKnnTopK(train, 25, 5, Some(cohort))
    val ib = Recommender.itemKnnTopK(train, cohort, 25, 5)
    val fused = graft.operators.Hybrid.fuseTopK(ua, ib, 0.5, 0.5, 5)
    assert(fused.count() == 50L) // 10 users × top-5
    assert(fused.join(train, Seq("user_id", "item_id")).count() == 0L)
    // fused rank-1 score is bounded by the sum of weights (both
    // children head-normalize to 1.0 before weighting)
    assert(fused.filter(col("rk") === 1)
      .agg(max(col("score"))).collect()(0).getDouble(0) <= 1.0001)
  }

  test("fold-1 top-K recommendations are deterministic and exclude seen items") {
    requireData()
    val s = spark
    val train = Tables.ratingsTsv(s, TRAIN1)
      .select(col("user_id"), col("item_id"), col("rating"))

    // small deterministic cohort keeps the spec fast
    val recs = Recommender.userKnnTopK(train, kNeighbors = 25, kItems = 5,
      targetUsers = Some(col("user_id") <= 20)).cache()
    assert(recs.count() == 100L) // 20 users × top-5
    assert(recs.join(train, Seq("user_id", "item_id")).count() == 0L)
    val again = Recommender.userKnnTopK(train, 25, 5, Some(col("user_id") <= 20))
      .collect().toSet
    assert(again == recs.collect().toSet) // bit-for-bit deterministic
  }
}
