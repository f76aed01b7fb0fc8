package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.VectorFns.{cosineArr, invEuclideanArr}
import graft.functions.Rounding.{r4, r6}

/**
 * Content-based recommender (SURVEY.md §2.10 R6/R7): item similarity
 * computed on FEATURE vectors instead of co-rating patterns, with the
 * K5 Euclidean fallback when the configured kernel returns exactly 0
 * (reference ContentBasedRatingRecommender.scala:34-42,
 * ContentBasedTopKRecommender.scala:42-98). The `embeddings` table
 * stands in for the reference's assembled genre flags (R6,
 * ContentRecommender.scala:36-53) — the operator shape is identical:
 * a per-item dense feature vector joined by item id.
 *
 * Scale design: the reference looked features up by a driver-side
 * linear scan per call (O(n) each, ContentBasedRatingRecommender
 * .scala:64-66); here features join by item_id and the per-user
 * candidate×rated grid is keyed on user_id, so each user's block
 * computes locally in one shuffle. Feature vectors never densify into
 * a matrix.
 */
object Content {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_content_topk" -> q32,
    "q52_content_rating_predict" -> q52
  )

  val K_NEIGHBORS = 8
  val K_ITEMS = 5

  /** The DENSE-vector form of the K1-K4 kernel SPI for feature
    * vectors (the reference's `setSimilarity` applies to the
    * content recommender too, ContentRecommender.scala); K2's mean is
    * the whole-vector mean — natural on dense arrays. */
  def featureKernel(kernel: Kernel, a: Column, b: Column): Column = kernel match {
    case Kernel.Cosine => cosineArr(a, b)
    case Kernel.Pearson =>
      val n = size(a).cast("double")
      val ma = graft.functions.VectorFns.sumArr(a) / n
      val mb = graft.functions.VectorFns.sumArr(b) / n
      (graft.functions.VectorFns.dotArr(a, b) - n * ma * mb) /
        (sqrt(graft.functions.VectorFns.sqNorm(a) - n * ma * ma) *
          sqrt(graft.functions.VectorFns.sqNorm(b) - n * mb * mb))
    case Kernel.Jaccard =>
      val inter = size(filter(zip_with(a, b, (x, y) => x > 0 && y > 0), p => p))
      val union = size(filter(zip_with(a, b, (x, y) => x > 0 || y > 0), p => p))
      when(union === 0, lit(0.0))
        .otherwise(inter.cast("double") / union.cast("double"))
    case Kernel.InvEuclidean => invEuclideanArr(a, b)
  }

  /** Feature-kernel column over (vi, vj): the 6-dp kernel with the K5
    * inverse-Euclidean fallback on exact zero — the ONE definition both
    * the top-K and rating-predict paths rank with. */
  private def k5FeatureSim(kernel: Kernel = Kernel.Cosine): Column = {
    val sim0 = r6(featureKernel(kernel, col("vi"), col("vj")))
    when(sim0 === 0.0, r6(invEuclideanArr(col("vi"), col("vj")))).otherwise(sim0)
  }

  /** Shared neighbor-scoring stage: rank `pairs` (must carry `sim`,
    * `j`, `r_uj`) per key group, keep top-k, aggregate the R4-family
    * Σ sim·r / Σ|sim| numerator/denominator, and drop zero-denominator
    * groups (the reference's empty-neighbor guard). */
  private def neighborAgg(pairs: DataFrame, keys: Seq[String],
                          kNeighbors: Int): DataFrame = {
    val wNb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("sim").desc, col("j").asc)
    pairs.withColumn("nrk", row_number().over(wNb))
      .filter(col("nrk") <= kNeighbors)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("sim") * col("r_uj")).as("num"), sum(abs(col("sim"))).as("den"))
      .filter(col("den") =!= 0.0)
  }

  private def itemFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("item_id"),
        col("embedding").cast("array<double>").as("fv"))

  /** R7 top-K for the `user_id % 50 = 0` cohort: candidates are
    * feature-bearing items the user has NOT rated; neighbors are the
    * feature-bearing items the user HAS rated, ranked by
    * cosine(feature_i, feature_j) with the K5 inverse-Euclidean
    * fallback; score = Σ sim·r(u,j) / Σ|sim| (the R4-family
    * denominator), top-5 per user. */
  private def q32(spark: SparkSession, dir: String): DataFrame =
    contentTopK(Tables.ratingsCached(spark, dir), itemFeatures(spark, dir),
      col("user_id") % 50 === 0, K_NEIGHBORS, K_ITEMS)

  /** R7's rating-predict half (reference
    * ContentBasedRatingRecommender.scala:44-87): for held-out
    * feature-bearing (user, item) pairs in the `user_id % 40 = 7`
    * cohort, predict from the OTHER feature-bearing items the user
    * rated — neighbors by feature cosine with the K5 fallback, top-8,
    * r̂ = Σ sim·r(u,j) / Σ|sim|. Emits actual vs predicted plus error. */
  private def q52(spark: SparkSession, dir: String): DataFrame = {
    val rf = Tables.ratingsCached(spark, dir)
      .join(itemFeatures(spark, dir), Seq("item_id")) // only feature-bearing items play
    val cohort = rf.filter(col("user_id") % 40 === 7)
      .select(col("user_id").as("u"), col("item_id").as("i"),
        col("rating").as("actual"), col("fv").as("vi"))
    val rated = rf.select(col("user_id").as("u"), col("item_id").as("j"),
      col("rating").as("r_uj"), col("fv").as("vj"))

    val pairs = cohort.join(rated, Seq("u"))
      .filter(col("j") =!= col("i"))
      .select(col("u"), col("i"), col("actual"), col("j"),
        k5FeatureSim().as("sim"), col("r_uj"))

    neighborAgg(pairs, Seq("u", "i", "actual"), K_NEIGHBORS)
      .select(col("u").as("user_id"), col("i").as("item_id"),
        r4(col("actual")).as("actual"),
        r4(col("num") / col("den")).as("predicted"),
        r4(abs(col("actual") - col("num") / col("den"))).as("abs_err"))
  }

  /** Reusable library surface: content-based top-N over long-form
    * ratings plus an item-feature DataFrame `(item_id, fv)`. */
  def contentTopK(ratings: DataFrame, features: DataFrame,
                  targetUsers: Column, kNeighbors: Int, kItems: Int,
                  kernel: Kernel = Kernel.Cosine): DataFrame =
    contentTopKRestricted(ratings, features, _.filter(targetUsers),
      kNeighbors, kItems, kernel)

  /** [[contentTopK]] for a DataFrame of target users (`user_id`
    * column) — the Estimator/Model `transform` surface. */
  def contentTopKFor(ratings: DataFrame, features: DataFrame,
                     targets: DataFrame, kNeighbors: Int, kItems: Int,
                     kernel: Kernel = Kernel.Cosine): DataFrame =
    contentTopKRestricted(ratings, features,
      _.join(broadcast(targets.select(col("user_id")).distinct()),
        Seq("user_id"), "left_semi"),
      kNeighbors, kItems, kernel)

  private def contentTopKRestricted(ratings: DataFrame, features: DataFrame,
                                    narrow: DataFrame => DataFrame,
                                    kNeighbors: Int, kItems: Int,
                                    kernel: Kernel = Kernel.Cosine): DataFrame = {
    val rated = narrow(ratings)
      .select(col("user_id").as("u"), col("item_id").as("j"), col("rating").as("r_uj"))
      .join(features.select(col("item_id").as("j"), col("fv").as("vj")), Seq("j"))

    val users = rated.select(col("u")).distinct()
    val cand = users.crossJoin(
        features.select(col("item_id").as("i"), col("fv").as("vi")))
      .join(ratings.select(col("user_id").as("u"), col("item_id").as("i")),
        Seq("u", "i"), "left_anti")

    // per-user candidate × rated grid, keyed on u — local to each block
    val pairs = cand.join(rated, Seq("u"))
      .filter(col("i") =!= col("j"))
      .select(col("u"), col("i"), col("j"), k5FeatureSim(kernel).as("sim"), col("r_uj"))

    val scored = neighborAgg(pairs, Seq("u", "i"), kNeighbors)
      .select(col("u"), col("i"), r4(col("num") / col("den")).as("score"))

    val wTop = Window.partitionBy(col("u")).orderBy(col("score").desc, col("i").asc)
    scored.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= kItems)
      .select(col("u").as("user_id"), col("i").as("item_id"), col("score"), col("rk"))
  }
}
