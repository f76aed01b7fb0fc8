package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ml.{ContentKnnRecommender, HybridRecommender, KnnRecommender}
import graft.operators.Evaluation

/** End-to-end parity on the REFERENCE'S OWN data: the MovieLens-100k
  * fold-1 train/test TSVs from /root/reference/data (read-only
  * inputs — the exact files the reference's CV harness consumes,
  * Main.scala:61-126), driven through the Estimator/Model surface
  * (`fit`/`transform`, mirroring RecommenderInterface.scala:27-51).
  * Proves a reference user can point this library at their existing
  * files and run every harness shape they run today. */
class MovieLensParitySpec extends SparkSuite {

  private val TRAIN1 = "/root/reference/data/train-fold1.csv"
  private val TEST1 = "/root/reference/data/test-fold1.csv"

  /** Cancel (don't fail) on machines without the reference checkout. */
  private def requireData(): Unit =
    assume(new java.io.File(TRAIN1).exists(),
      s"reference dataset not present at $TRAIN1")

  private def trainDf = Tables.ratingsTsv(spark, TRAIN1)
    .select(col("user_id"), col("item_id"), col("rating"))

  test("fold-1 user-kNN predictions hit sane MovieLens accuracy") {
    requireData()
    val train = trainDf
    val test = Tables.ratingsTsv(spark, TEST1)
    assert(train.count() == 80000L)
    assert(test.count() == 20000L)

    val model = new KnnRecommender().setUserBased(true).setKNeighbors(25)
      .fit(train)
    val preds = model.predictRatings(
      test.select(col("user_id").as("u"), col("item_id"),
        col("rating").as("actual"))).cache()

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

  test("fold-1 DENSE-Pearson user-kNN — the reference's Main.scala:354-356 workload") {
    requireData()
    val train = trainDf.cache()
    val test = Tables.ratingsTsv(spark, TEST1)

    // the reference experiment: setSimilarity(new PearsonSimilarity)
    // over DENSE user vectors with the configured catalog size
    // (_numberOfItems = 1682 counts items unrated in the fold) —
    // exactly the semantics `denseSims` + `catalogSize` restore
    val model = new KnnRecommender().setUserBased(true).setKNeighbors(25)
      .setKernel("pearson").setDenseSims(true).setCatalogSize(1682L)
      .fit(train)
    val preds = model.predictRatings(
      test.select(col("user_id").as("u"), col("item_id"),
        col("rating").as("actual"))).cache()

    val n = preds.count()
    assert(n > 18000L, s"coverage too low: $n of 20000 test pairs")
    val row = preds.agg(
      sqrt(avg(pow(col("actual") - col("predicted"), 2))).as("rmse"),
      avg(abs(col("actual") - col("predicted"))).as("mae")).collect()(0)
    val (rmse, mae) = (row.getDouble(0), row.getDouble(1))
    // zero-inclusive whole-profile Pearson is a WEAKER kernel than
    // mean-centered cosine on ML-100k (the reference's own quirk, not
    // a bug) — the band is wider but still catches broken formulas
    assert(rmse > 0.7 && rmse < 1.35, s"dense-Pearson RMSE $rmse outside band")
    assert(mae > 0.5 && mae < 1.1, s"dense-Pearson MAE $mae outside band")
  }

  test("fold-1 item-kNN predictions hit sane MovieLens accuracy") {
    requireData()
    val test = Tables.ratingsTsv(spark, TEST1)
    val model = new KnnRecommender().setUserBased(false).setKNeighbors(25)
      .fit(trainDf)
    val preds = model.predictRatings(
      test.select(col("user_id").as("u"), col("item_id").as("i"),
        col("rating").as("actual"))).cache()
    assert(preds.count() > 18000L)
    val rmse = preds.agg(
      sqrt(avg(pow(col("actual") - col("predicted"), 2)))).collect()(0).getDouble(0)
    assert(rmse > 0.7 && rmse < 1.3, s"item-kNN RMSE $rmse outside sane band")
  }

  test("fold-1 content-based top-K runs on the reference's genre features") {
    requireData()
    val train = trainDf
    // R6: assemble the 19 genre flags into feature vectors
    val raw = Tables.featuresCsv(spark, "/root/reference/data/features.csv")
    val feats = raw.select(col("id").as("item_id"),
      array(raw.columns.filter(_ != "id").map(c => col(c).cast("double")): _*)
        .as("fv"))
    val model = new ContentKnnRecommender().setKNeighbors(8).setKItems(5)
      .setItemFeatures(feats)
      .fit(train)
    val recs = model.transform(train.filter(col("user_id") <= 10))
    assert(recs.count() == 50L) // 10 users × top-5
    assert(recs.join(train, Seq("user_id", "item_id")).count() == 0L)
  }

  test("fold-1 hybrid fusion runs the reference's fourth harness shape") {
    requireData()
    val train = trainDf
    val model = new HybridRecommender()
      .setChildren(
        new KnnRecommender().setUserBased(true).setKNeighbors(25).setKItems(5),
        new KnnRecommender().setUserBased(false).setKNeighbors(25).setKItems(5))
      .setWeightA(0.5).setWeightB(0.5).setKItems(5)
      .fit(train)
    val fused = model.transform(train.filter(col("user_id") <= 10))
    assert(fused.count() == 50L) // 10 users × top-5
    assert(fused.join(train, Seq("user_id", "item_id")).count() == 0L)
    // fused rank-1 score is bounded by the sum of weights (both
    // children head-normalize to 1.0 before weighting)
    assert(fused.filter(col("rk") === 1)
      .agg(max(col("score"))).collect()(0).getDouble(0) <= 1.0001)
  }

  test("fold-1 top-K recommendations are deterministic and exclude seen items") {
    requireData()
    val train = trainDf
    val model = new KnnRecommender().setUserBased(true)
      .setKNeighbors(25).setKItems(5)
      .fit(train)
    val targets = train.filter(col("user_id") <= 20).select("user_id")

    val recs = model.transform(targets).cache()
    assert(recs.count() == 100L) // 20 users × top-5
    assert(recs.join(train, Seq("user_id", "item_id")).count() == 0L)
    val again = model.transform(targets).collect().toSet
    assert(again == recs.collect().toSet) // bit-for-bit deterministic
  }

  test("fold-1 ranking metrics of the real user-kNN land in a sane band") {
    requireData()
    val train = trainDf
    val test = Tables.ratingsTsv(spark, TEST1)
    // the reference's ranking experiment (Main.scala:96-124): top-10
    // recommendations scored against the held-out fold's rating ≥ 4.0
    // relevant sets (E5 threshold)
    val model = new KnnRecommender().setUserBased(true)
      .setKNeighbors(25).setKItems(10)
      .fit(train)
    val targets = train.filter(col("user_id") <= 200).select("user_id")
    val recs = model.transform(targets)
    val relevant = test.filter(col("rating") >= 4.0 && col("user_id") <= 200)
      .select("user_id", "item_id")
    val m = Evaluation.rankingMetricsAt(recs, relevant, 10).collect()(0)
    val (prec, rec, map) = (m.getDouble(0), m.getDouble(1), m.getDouble(2))
    // plain rating-weighted cosine kNN top-10 on ML-100k: low single
    // digits precision; zero would mean a broken join, > 0.2 leakage
    assert(prec > 0.005 && prec < 0.2, s"precision@10 $prec outside band")
    assert(rec > 0.005 && rec < 0.5, s"recall@10 $rec outside band")
    assert(map > 0.001 && map < 0.2, s"MAP@10 $map outside band")
    info(f"precision@10=$prec%.4f recall@10=$rec%.4f MAP@10=$map%.4f")
  }

  test("fold-1 ALS factorization beats the kNN RMSE band (beyond-reference scale path)") {
    requireData()
    val train = trainDf
    val test = Tables.ratingsTsv(spark, TEST1)
    val model = new graft.ml.AlsRecommender()
      .setRank(10).setMaxIter(10).setRegParam(0.1).setSeed(42L).setKItems(5)
      .fit(train)
    val preds = model.predictRatings(
      test.select(col("user_id").as("u"), col("item_id"),
        col("rating").as("actual"))).cache()

    val n = preds.count()
    // coldStartStrategy=drop removes test items/users unseen in train
    assert(n > 18000L, s"coverage too low: $n of 20000 test pairs")
    val row = preds.agg(
      sqrt(avg(pow(col("actual") - col("predicted"), 2))).as("rmse"),
      avg(abs(col("actual") - col("predicted"))).as("mae")).collect()(0)
    val (rmse, mae) = (row.getDouble(0), row.getDouble(1))
    // rank-10 ALS lands near 0.92 RMSE on ML-100k — materially under
    // the kNN band's ~1.0; the bounds catch broken factors and leakage
    assert(rmse > 0.8 && rmse < 1.0, s"ALS RMSE $rmse outside band")
    assert(mae > 0.6 && mae < 0.8, s"ALS MAE $mae outside band")
    info(f"ALS fold-1 RMSE=$rmse%.4f MAE=$mae%.4f over $n pairs")

    // top-k surface: k rows per target, ranked, seen items allowed to
    // drop only via recommendForUserSubset's own candidate set
    val recs = model.transform(train.filter(col("user_id") <= 20)
      .select("user_id"))
    assert(recs.count() == 100L)
    assert(recs.groupBy("user_id").count().filter(col("count") =!= 5).count() == 0L)
  }

  test("full 5-fold CV of the real kNN estimators (reference Main.scala:61-192)") {
    requireData()
    // the reference's flagship harness: both top-K recommenders fitted
    // per fold, top-10 recommendations scored against the held-out
    // fold's rating ≥ 4.0 relevant sets. The cohort param (user_id ≤
    // 200 — the same bound the fold-1 ranking test uses) keeps the
    // transform side wall-bounded; the FIT runs over the full 80k-row
    // fold, so the expensive kernel path is exercised 5 × 2 times.
    val results = (1 to 5).map { i =>
      val train = Tables
        .ratingsTsv(spark, s"/root/reference/data/train-fold$i.csv")
        .select(col("user_id"), col("item_id"), col("rating")).cache()
      val test = Tables.ratingsTsv(spark, s"/root/reference/data/test-fold$i.csv")
      assert(train.count() == 80000L && test.count() == 20000L,
        s"fold $i is not the reference's 80k/20k split")
      val targets = train.filter(col("user_id") <= 200).select("user_id")
      val relevant = test.filter(col("rating") >= 4.0 && col("user_id") <= 200)
        .select("user_id", "item_id")
      def metricsOf(userBased: Boolean) = {
        val model = new KnnRecommender().setUserBased(userBased)
          .setKNeighbors(25).setKItems(10).fit(train)
        val m = Evaluation
          .rankingMetricsAt(model.transform(targets), relevant, 10)
          .collect()(0)
        (m.getDouble(0), m.getDouble(1), m.getDouble(2))
      }
      val u = metricsOf(userBased = true)
      val it = metricsOf(userBased = false)
      train.unpersist()
      info(f"fold $i user-kNN  prec@10=${u._1}%.4f recall@10=${u._2}%.4f MAP@10=${u._3}%.4f")
      info(f"fold $i item-kNN  prec@10=${it._1}%.4f recall@10=${it._2}%.4f MAP@10=${it._3}%.4f")
      (i, u, it)
    }
    // per-fold golden bands (the fold-1 ranking test's, applied to all
    // five folds and both orientations): zero means a broken join,
    // above the cap means leakage from the held-out fold
    results.foreach { case (i, u, it) =>
      Seq(("user", u), ("item", it)).foreach { case (side, (prec, rec, map)) =>
        assert(prec > 0.005 && prec < 0.2,
          s"fold $i $side precision@10 $prec outside band")
        assert(rec > 0.005 && rec < 0.5,
          s"fold $i $side recall@10 $rec outside band")
        assert(map > 0.001 && map < 0.2,
          s"fold $i $side MAP@10 $map outside band")
      }
    }
    // the reference's final readout is the FOLD AVERAGE (its
    // accumulators sum per-user metrics across folds) — per-fold MAP
    // at the 1e-2 scale over a 200-user cohort varies several-fold
    // with fold sampling, so the stable cross-fold invariant is the
    // mean, not the spread
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val (uMap, iMap) = (mean(results.map(_._2._3)), mean(results.map(_._3._3)))
    info(f"5-fold mean MAP@10: user-kNN $uMap%.4f, item-kNN $iMap%.4f")
    assert(uMap > 0.003 && uMap < 0.1, s"user-kNN 5-fold MAP $uMap outside band")
    assert(iMap > 0.01 && iMap < 0.1, s"item-kNN 5-fold MAP $iMap outside band")
  }

  test("5-fold CV of the content and hybrid recommenders (reference Main.scala:193-335)") {
    requireData()
    // the reference's remaining two CV harnesses: the content-based
    // top-K over the 19 genre flags, and the user+item hybrid fusion.
    // Same protocol as the kNN CV: fit per fold on the full 80k rows,
    // rank top-10 for the ≤200-user cohort against rating ≥ 4.0
    // relevant sets, read the FOLD MEAN.
    val raw = Tables.featuresCsv(spark, "/root/reference/data/features.csv")
    val feats = raw.select(col("id").as("item_id"),
      array(raw.columns.filter(_ != "id").map(c => col(c).cast("double")): _*)
        .as("fv")).cache()
    val results = (1 to 5).map { i =>
      val train = Tables
        .ratingsTsv(spark, s"/root/reference/data/train-fold$i.csv")
        .select(col("user_id"), col("item_id"), col("rating")).cache()
      val test = Tables.ratingsTsv(spark, s"/root/reference/data/test-fold$i.csv")
      val targets = train.filter(col("user_id") <= 200).select("user_id")
      val relevant = test.filter(col("rating") >= 4.0 && col("user_id") <= 200)
        .select("user_id", "item_id")
      def metricsOf(recs: org.apache.spark.sql.DataFrame) = {
        val m = Evaluation.rankingMetricsAt(recs, relevant, 10).collect()(0)
        (m.getDouble(0), m.getDouble(1), m.getDouble(2))
      }
      val cm = metricsOf(new ContentKnnRecommender()
        .setKNeighbors(8).setKItems(10).setItemFeatures(feats)
        .fit(train).transform(targets))
      val hm = metricsOf(new HybridRecommender()
        .setChildren(
          new KnnRecommender().setUserBased(true).setKNeighbors(25).setKItems(10),
          new KnnRecommender().setUserBased(false).setKNeighbors(25).setKItems(10))
        .setWeightA(0.5).setWeightB(0.5).setKItems(10)
        .fit(train).transform(targets))
      train.unpersist()
      info(f"fold $i content prec@10=${cm._1}%.4f recall@10=${cm._2}%.4f MAP@10=${cm._3}%.4f")
      info(f"fold $i hybrid  prec@10=${hm._1}%.4f recall@10=${hm._2}%.4f MAP@10=${hm._3}%.4f")
      (cm, hm)
    }
    def mean(xs: Seq[Double]) = xs.sum / xs.length
    val (cPrec, cMap) = (mean(results.map(_._1._1)), mean(results.map(_._1._3)))
    val (hPrec, hMap) = (mean(results.map(_._2._1)), mean(results.map(_._2._3)))
    info(f"5-fold means: content prec@10=$cPrec%.4f MAP@10=$cMap%.4f; hybrid prec@10=$hPrec%.4f MAP@10=$hMap%.4f")
    // genre-only content ranking is WEAK on ML-100k (19 binary
    // features) — the bound catches broken joins (all-zero) and
    // leakage (implausibly high), nothing tighter is honest
    assert(cPrec >= 0.0 && cPrec < 0.2, s"content 5-fold prec $cPrec outside band")
    assert(results.map(_._1._1).sum > 0.0,
      "content recommender hit nothing across five folds — broken join")
    // the hybrid fuses the two kNN rankers; its fold-mean must land in
    // the band its children span (it cannot be wildly off both)
    assert(hPrec > 0.005 && hPrec < 0.2, s"hybrid 5-fold prec $hPrec outside band")
    assert(hMap > 0.003 && hMap < 0.15, s"hybrid 5-fold MAP $hMap outside band")
    feats.unpersist()
  }

  test("estimators compose inside org.apache.spark.ml.Pipeline") {
    requireData()
    import org.apache.spark.ml.Pipeline
    val train = trainDf
    val pipe = new Pipeline().setStages(Array(
      new KnnRecommender().setUserBased(true).setKNeighbors(25).setKItems(5)))
    val fitted = pipe.fit(train)
    // PipelineModel.transform drives the fitted recommender stage
    val recs = fitted.transform(train.filter(col("user_id") <= 10)
      .select("user_id"))
    assert(recs.count() == 50L, "5 ranked items per target user")
    assert(recs.columns.contains("item_id") && recs.columns.contains("rk"))
  }
}
