package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.Rounding.r4

/**
 * Evaluation operators (SURVEY.md §2.11 E1-E5): ranking metrics
 * (precision/recall/AP@k, reference RankingMetrics.scala:33-53) for a
 * deterministic popularity recommender against the rating≥30 relevance
 * threshold (E5 analog of Main.scala:101-103), plus prediction metrics
 * RMSE/MAE (reference PredictionMetrics.scala:31-43) for the user-mean
 * predictor — all as DataFrame aggregations, no accumulators
 * (the reference's I1/I2 executor→driver channel is replaced by the
 * result DataFrame itself).
 *
 * AP@k follows the reference formula (Σᵢ |sel[..i] ∩ rel| / i) / k —
 * but over the RANKED list, fixing the latent unordered-Set bug
 * (RankingMetrics.scala:49-53); divisor is k, not min(k, |rel|),
 * preserving reference semantics.
 */
object Evaluation {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_eval_metrics" -> q27,
    "q44_cv_metrics" -> q44,
    "q96_ndcg" -> q96,
    "q104_als_topk" -> q104
  )

  val K = 10
  val REL_THRESHOLD = 30.0
  val N_FOLDS = 5

  private def q27(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.ratingsCached(spark, dir)
    val umean = r.groupBy("user_id").agg(avg(col("rating")).as("umean"))

    val pop = popTopK(r)

    val rel = r.filter(col("rating") >= REL_THRESHOLD)
      .select(col("user_id"), col("item_id"))
    val nrel = rel.groupBy("user_id").agg(count(lit(1)).as("n_rel"))

    val grid = r.select("user_id").distinct().crossJoin(broadcast(pop))
    val hits = grid
      .join(rel.withColumn("hit_", lit(1)), Seq("user_id", "item_id"), "left")
      .withColumn("hit", coalesce(col("hit_"), lit(0)))
    val cum = hits.withColumn("cum",
      sum(col("hit")).over(Window.partitionBy(col("user_id")).orderBy(col("rn"))))

    val perUser = cum.groupBy("user_id").agg(
        (sum(col("hit")) / lit(10.0)).as("prec10"),
        (sum(col("cum").cast("double") / col("rn")) / lit(10.0)).as("ap10"),
        sum(col("hit")).as("nhits"))
      .join(nrel, Seq("user_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("rec10",
        when(col("n_rel") > 0, col("nhits").cast("double") / col("n_rel"))
          .otherwise(lit(0.0)))

    val rankMetrics = perUser.agg(
      r4(avg(col("prec10"))).as("avg_precision_at_10"),
      r4(avg(col("rec10"))).as("avg_recall_at_10"),
      r4(avg(col("ap10"))).as("map_at_10"))

    val predMetrics = r.join(broadcast(umean), Seq("user_id"))
      .select((col("rating") - col("umean")).as("err"))
      .agg(r4(sqrt(avg(col("err") * col("err")))).as("rmse"),
        r4(avg(abs(col("err")))).as("mae"))

    rankMetrics.crossJoin(predMetrics)
  }

  /** E1-E3 over an ARBITRARY ranked recommendation list: per-user
    * Precision@k, Recall@k and AP@k against a relevant-pair set,
    * averaged into one row — the reference's ranking experiment
    * (Main.scala:96-124, RankingMetrics.scala:33-53) as a library
    * surface any recommender's `(user_id, item_id, rk)` output plugs
    * into. AP@k preserves the reference formula — Σ_{i≤k} |top-i ∩
    * rel| / i, divided by k, over the RANKED list, every prefix
    * counted (not only hit positions) — and recall guards the empty
    * relevant set as 0 (E2). Users in `recs` with NO relevant pairs
    * still average in, exactly like the reference's per-user loop. */
  def rankingMetricsAt(recs: DataFrame, relevant: DataFrame, k: Int): DataFrame =
    rankingMetricsAt(recs, relevant, k, compatUnorderedAp = false)

  /** [[rankingMetricsAt]] with the reference-parity seam (SURVEY §5
    * risk 1): `compatUnorderedAp = true` replays the reference's AP
    * EXACTLY AS SHIPPED — `_selected.take(i)` over an unordered
    * `Set[Int]` (RankingMetrics.scala:49-53), so prefix order is the
    * JVM's hash-set iteration order, not rank order. That is a latent
    * bug the corrected default fixes, but bit-parity experiments
    * against reference outputs need the shipped semantics. Precision
    * and recall are pure set intersections — identical either way;
    * only AP differs.
    *
    * Implementation note: hash-set iteration order is a JVM
    * collection behavior, inexpressible in SQL — so compat mode runs
    * a typed `Dataset.map` over per-user lists already bounded by k
    * (recs) and the user's relevant set, mirroring the reference's
    * own per-user loop (Main.scala:96-124). The default path stays
    * pure codegen'd SQL. */
  def rankingMetricsAt(recs: DataFrame, relevant: DataFrame, k: Int,
                       compatUnorderedAp: Boolean): DataFrame = {
    if (compatUnorderedAp) {
      val spark = recs.sparkSession
      import spark.implicits._
      val rel = relevant.select(col("user_id").cast("long").as("user_id"),
        col("item_id").cast("long").as("item_id")).distinct()
      val sel = recs.select(col("user_id").cast("long").as("user_id"),
          col("item_id").cast("long").as("item_id"), col("rk").cast("int").as("rk"))
        .groupBy("user_id")
        .agg(transform(array_sort(collect_list(struct(col("rk"), col("item_id")))),
          s => s.getField("item_id")).as("sel_ranked"))
      val relAgg = rel.groupBy("user_id").agg(collect_set(col("item_id")).as("rel_items"))
      val per = sel.join(relAgg, Seq("user_id"), "left")
        .select(col("user_id"), col("sel_ranked"),
          coalesce(col("rel_items"), array().cast("array<bigint>")).as("rel_items"))
        .as[(Long, Seq[Long], Seq[Long])]
        .map { case (u, selRanked, relItems) =>
          // the reference's exact collection types and calls. Compat
          // mode replays Scala's Set[Int] hash-iteration order, so ids
          // MUST narrow losslessly (a truncated id would silently
          // collide) — and the replayed order is a Scala/JVM collections
          // detail: a stdlib change flips EvaluationSpec's pin, which is
          // the intended loud signal, not something to adapt around.
          (selRanked.iterator ++ relItems.iterator).foreach(id => require(
            id.isValidInt, s"compatUnorderedAp requires int-sized ids, got $id"))
          val selSet: Set[Int] = selRanked.map(_.toInt).toSet
          val relSet: Set[Int] = relItems.map(_.toInt).toSet
          val nHit = selSet.intersect(relSet).size
          val ap = (1 to k).map(i =>
            selSet.take(i).intersect(relSet).size.toDouble / i).sum / k
          val rec = if (relSet.isEmpty) 0.0 else nHit.toDouble / relSet.size
          (u, nHit.toDouble / k, rec, ap)
        }
        .toDF("user_id", "preck", "reck", "apk")
      return per.agg(r4(avg(col("preck"))).as(s"avg_precision_at_$k"),
        r4(avg(col("reck"))).as(s"avg_recall_at_$k"),
        r4(avg(col("apk"))).as(s"map_at_$k"))
    }
    val rel = relevant.select("user_id", "item_id").distinct()
    val nrel = rel.groupBy("user_id").agg(count(lit(1)).as("n_rel"))
    val hits = recs.select("user_id", "item_id", "rk")
      .join(rel.withColumn("hit_", lit(1)), Seq("user_id", "item_id"), "left")
      .withColumn("hit", coalesce(col("hit_"), lit(0)))
    val cum = hits.withColumn("cum",
      sum(col("hit")).over(Window.partitionBy(col("user_id")).orderBy(col("rk"))))
    cum.groupBy("user_id").agg(
        (sum(col("hit")) / lit(k.toDouble)).as("preck"),
        (sum(col("cum").cast("double") / col("rk")) / lit(k.toDouble)).as("apk"),
        sum(col("hit")).as("nhits"))
      .join(nrel, Seq("user_id"), "left")
      .withColumn("reck",
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          col("nhits").cast("double") / col("n_rel")).otherwise(lit(0.0)))
      .agg(r4(avg(col("preck"))).as(s"avg_precision_at_$k"),
        r4(avg(col("reck"))).as(s"avg_recall_at_$k"),
        r4(avg(col("apk"))).as(s"map_at_$k"))
  }

  /** E6: the 5-fold cross-validation harness as ONE distributed pass —
    * the rebuild of the reference's per-fold CSV-read/fit/score driver
    * loop (Main.scala:61-126). Folds are a deterministic hash of the
    * rating cell; the leave-fold-out train mean for (user, fold) is
    * computed algebraically from per-user totals minus the fold's own
    * contribution, so all 5 train/test splits evaluate in a single
    * keyed aggregation instead of 5 separate fit jobs. Emits one row
    * per fold (RMSE/MAE of the user-mean predictor + test size) — the
    * A10 metric averaging across folds is then a trivial avg. */
  private def q44(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.ratingsCached(spark, dir)
      .withColumn("fold",
        pmod(col("user_id") * 31 + col("item_id"), lit(N_FOLDS)).cast("int"))
    val tot = r.groupBy("user_id")
      .agg(sum(col("rating")).as("sum_all"), count(lit(1)).as("cnt_all"))
    val perFold = r.groupBy(col("user_id"), col("fold"))
      .agg(sum(col("rating")).as("sum_f"), count(lit(1)).as("cnt_f"))
    // train mean for (user, fold) = mean over the OTHER folds' rows;
    // users whose ratings all sit in one fold have no train rows there
    // and drop out of that fold's test set (cnt_all > cnt_f)
    val trainMean = perFold.join(broadcast(tot), Seq("user_id"))
      .filter(col("cnt_all") > col("cnt_f"))
      .select(col("user_id"), col("fold"),
        ((col("sum_all") - col("sum_f")) / (col("cnt_all") - col("cnt_f")))
          .as("train_mean"))
    r.join(trainMean, Seq("user_id", "fold"))
      .select(col("fold"), (col("rating") - col("train_mean")).as("err"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_test"),
        r4(sqrt(avg(col("err") * col("err")))).as("rmse"),
        r4(avg(abs(col("err")))).as("mae"))
  }

  /** ALS top-k cohort size divisor: every `user_id % ALS_COHORT_MOD
    * == 0` user is scored. */
  val ALS_COHORT_MOD = 50
  /** ALS readout depth. */
  val ALS_K = 5

  /** Per-corpus expected values of the 6-dp ALS readout digest, keyed
    * by the ratings-view row count (the corpus signature) — measured
    * by `tools/AlsDeterminism`, which proved the digest bit-stable
    * across JVMs AND across parallelism (local[16] vs local[32])
    * before any value was baked. An unknown corpus yields
    * `digest_ok = -1` (no baked expectation) rather than a false
    * verdict; the driver's oracle only ever runs at sf0.01. A
    * testdata regeneration that changes rating VALUES (not just
    * schema) flips `digest_ok` to 0 and hash-fails the row — which is
    * the point: the digest is the gate, and `tools/AlsDeterminism`
    * re-derives the literals in one run per SF. */
  val ALS_DIGESTS: Map[Long, Long] = Map(
    5382L   -> 1407939674L,    // sf0.001
    59391L  -> 19679235027L,   // sf0.01
    599351L -> 211372329979L   // sf0.1
  )

  /** The ml-layer ALS surface under the driver's HARD gate (VERDICT r8
    * task #1 — previously `no_oracle` rows-only, now hash-exact via
    * the q99 verdict posture, `Similarity.scala` q99): seed-fixed
    * factorization (rank 10, 10 sweeps, seed 42,
    * coldStartStrategy=drop) of the ratings view, top-[[ALS_K]]
    * readout for the canonical `user_id % ALS_COHORT_MOD = 0` cohort,
    * scores rounded to 6 dp — then collapsed to ONE contract row of
    * oracle-recomputable facts plus in-Spark verdicts:
    *
    *  - `n_users` — users actually receiving recommendations; the
    *    DuckDB oracle recomputes the cohort count independently, so a
    *    cold-start drop or cohort regression hash-fails the row;
    *  - `k`, `n_rows` — readout depth and total rows (= n_users·k);
    *  - `complete_ok` — every scored user has exactly k rows with
    *    ranks forming 1..k (min over per-user checks);
    *  - `digest_ok` — the order-insensitive md5-prefix digest of the
    *    6-dp (user, item, rk, score) readout equals the baked
    *    [[ALS_DIGESTS]] literal for this corpus. Determinism was
    *    proven by `tools/AlsDeterminism` before baking, so the
    *    literal is replay-stable; a factorization/readout regression
    *    now hash-fails the driver row instead of hiding behind
    *    `no_oracle`. The oracle pins both verdicts to 1.
    *
    * Scale posture: ALS is the CF path when the rating matrix itself
    * is the 100-TB table — O(nnz·rank²) per sweep over block-
    * partitioned factors, and `recommendForUserSubset` scores only
    * the cohort (never all-users unless asked). The contract-row
    * collapse adds three 1-row aggregates over the k·|cohort| readout
    * — noise next to the fit. */
  private def q104(spark: SparkSession, dir: String): DataFrame = {
    val ratings = Tables.ratingsCached(spark, dir)
    val model = new graft.ml.AlsRecommender()
      .setRank(10).setMaxIter(10).setSeed(42L).setKItems(ALS_K)
      .fit(ratings)
    val cohort = ratings.select(col("user_id")).distinct()
      .filter(col("user_id") % ALS_COHORT_MOD === 0)
    val recs = model.transform(cohort)
      .select(col("user_id"), col("item_id"), col("rk"),
        round(col("score"), 6).as("score"))

    val perUser = recs.groupBy(col("user_id")).agg(
      count(lit(1)).as("cnt"),
      count_distinct(col("rk")).as("nrk"),
      max(col("rk")).as("maxrk"))
    val cover = perUser.agg(
      count(lit(1)).as("n_users"),
      sum(col("cnt")).as("n_rows"),
      min((col("cnt") === ALS_K && col("nrk") === ALS_K &&
        col("maxrk") === ALS_K).cast("int")).as("complete_ok"))
    // same digest construction tools/AlsDeterminism proved stable:
    // md5 the 6-dp row text, sum the 7-hex-digit prefixes — an
    // order-insensitive fold, safe at any parallelism
    val dig = recs
      .select(md5(concat_ws("_", col("user_id"), col("item_id"),
        col("rk"), col("score"))).as("h"))
      .agg(sum(conv(substring(col("h"), 1, 7), 16, 10).cast("long"))
        .as("digest"))
    val key = ratings.agg(count(lit(1)).as("n_ratings"))

    val expected = ALS_DIGESTS.foldLeft(lit(null).cast("long")) {
      case (acc, (nr, d)) => when(col("n_ratings") === nr, lit(d)).otherwise(acc)
    }
    cover.crossJoin(dig).crossJoin(key)
      .select(col("n_users"), lit(ALS_K).as("k"), col("n_rows"),
        col("complete_ok"),
        when(expected.isNull, lit(-1))
          .when(col("digest") === expected, lit(1))
          .otherwise(lit(0)).as("digest_ok"))
  }

  /** Popularity top-[[K]] with dense ranks — shared by q27 and q96.
    * orderBy().limit() is TakeOrdered: every partition keeps only its
    * local top-K, the driver merges K-row buffers. No global
    * single-partition window anywhere. Ranks derive windowlessly from
    * the K surviving rows (struct sort on (-cnt, item_id) +
    * posexplode). */
  private def popTopK(r: DataFrame): DataFrame =
    r.groupBy("item_id").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item_id").asc).limit(K)
      .agg(collect_list(struct((-col("cnt")).as("negcnt"), col("item_id"))).as("xs"))
      .select(posexplode(array_sort(col("xs"))))
      .select((col("pos") + 1).cast("int").as("rn"), col("col.item_id").as("item_id"))

  /** Mean NDCG@[[K]] of the popularity recommender against the
    * ≥ [[REL_THRESHOLD]] relevant sets — the graded-ranking metric
    * E1–E3 lack (DCG discounts hits by log₂ rank; IDCG normalizes by
    * the best achievable ordering, min(K, |rel|) ideal hits). Users
    * with no relevant items score 0, matching q27's recall convention.
    *
    * Float discipline: every per-rank discount term walks ONE IEEE
    * sequence — hit / (ln(rank+1) / ln 2) — is r6-quantized to
    * DECIMAL(20,6) and only then summed, so the per-user DCG/IDCG
    * sums and the final cross-user mean are order-independent at any
    * parallelism. Scale shape: the K-row ranked dim broadcasts over
    * the user grid; IDCG explodes ≤ K rows per user; everything else
    * is keyed aggs. */
  private def q96(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.r6
    val r = Tables.ratingsCached(spark, dir)
    def log2(c: Column): Column = log(c.cast("double")) / log(lit(2.0))
    val rel = r.filter(col("rating") >= REL_THRESHOLD)
      .select(col("user_id"), col("item_id"))
    val nrel = rel.groupBy("user_id").agg(count(lit(1)).as("n_rel"))
    val users = r.select("user_id").distinct()

    val dcg = users.crossJoin(broadcast(popTopK(r)))
      .join(rel.withColumn("hit_", lit(1)), Seq("user_id", "item_id"), "left")
      .select(col("user_id"),
        r6(coalesce(col("hit_"), lit(0)).cast("double") / log2(col("rn") + 1))
          .cast("decimal(20,6)").as("t"))
      .groupBy("user_id").agg(sum(col("t")).as("dcg"))

    val idcg = nrel
      .select(col("user_id"),
        explode(sequence(lit(1), least(col("n_rel"), lit(K)).cast("int"))).as("i"))
      .select(col("user_id"),
        r6(lit(1.0) / log2(col("i") + 1)).cast("decimal(20,6)").as("t"))
      .groupBy("user_id").agg(sum(col("t")).as("idcg"))

    users.join(dcg, Seq("user_id")).join(idcg, Seq("user_id"), "left")
      .select(r6(when(col("idcg").isNotNull,
          col("dcg").cast("double") / col("idcg").cast("double"))
        .otherwise(lit(0.0))).cast("decimal(20,6)").as("nd"))
      .agg(r4(sum(col("nd")).cast("double") / count(lit(1)))
          .as("avg_ndcg_at_10"),
        count(lit(1)).as("n_users"))
  }
}
