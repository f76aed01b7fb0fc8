package graft

import org.apache.spark.sql.functions._
import graft.operators.{Content, Hybrid}

/** Fixtures for the content-based scorer (feature-vector similarity,
  * K5 fallback) and the hybrid head-normalized fusion. */
class ContentHybridSpec extends SparkSuite {

  test("contentTopK scores candidates by feature cosine against rated items") {
    val s = spark
    import s.implicits._
    // user 1 rated item 1 (5.0) and item 2 (1.0). Candidates 3, 4:
    //  feat(3) ∥ feat(1) (cos 1), ⊥ feat(2) (cos 0 → K5 inv-euclid);
    //  feat(4) ∥ feat(2), ⊥ feat(1).
    val ratings = Seq((1, 1, 5.0), (1, 2, 1.0)).toDF("user_id", "item_id", "rating")
    val feats = Seq(
      (1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)),
      (3, Seq(2.0, 0.0)), (4, Seq(0.0, 3.0))
    ).toDF("item_id", "fv")
    val got = Content.contentTopK(ratings, feats, lit(true), kNeighbors = 2, kItems = 2)
      .orderBy("rk")
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getInt(3))).toSeq
    // K5 fallback for the orthogonal pair: 1/(dist+1), dist(3→2)=√5,
    // dist(4→1)=√10. score = (1·r_parallel + f·r_orth)/(1 + f)
    val f3 = math.floor(1.0 / (math.sqrt(5.0) + 1) * 1e6 + 0.5) / 1e6
    val s3 = math.floor((5.0 + f3 * 1.0) / (1 + f3) * 1e4 + 0.5) / 1e4
    val f4 = math.floor(1.0 / (math.sqrt(10.0) + 1) * 1e6 + 0.5) / 1e6
    val s4 = math.floor((f4 * 5.0 + 1.0) / (1 + f4) * 1e4 + 0.5) / 1e4
    assert(got == Seq((3, s3, 1), (4, s4, 2)))
  }

  test("LSH candidate seam: pruned ≡ exact on a clustered fixture, candidates genuinely pruned, no user×catalog join in the plan") {
    val s = spark
    import s.implicits._
    // two feature "genres" in 16 dims: A items live in the positive
    // orthant (every band-bucket "1111"), B items in the negative
    // ("0000"). Users rate only A items → LSH candidates are A items
    // only; B items score negative cosine in the exact grid so they
    // can never enter a top-5 — candidate-set difference is invisible
    // in the output, by construction, which is the seam's contract.
    def vec(base: Double, itemId: Int): Seq[Double] =
      (1 to 16).map(d => base * (1.0 + 0.1 * ((itemId * d) % 7)))
    val aItems = (1 to 12).map(i => (i, vec(1.0, i)))
    val bItems = (101 to 112).map(i => (i, vec(-1.0, i)))
    val feats = (aItems ++ bItems).toDF("item_id", "fv")
    val ratings = (for {
      u <- 1 to 6
      j <- 1 to 4 // users rate A items 1-4; 5-12 stay candidates
    } yield (u, j, 1.0 + ((u * 7 + j) % 9) * 0.5)).toDF("user_id", "item_id", "rating")

    val exact = Content.contentTopK(ratings, feats, lit(true), 8, 5)
    val pruned = Content.contentTopK(ratings, feats, lit(true), 8, 5,
      source = Content.CandidateSource.LshBuckets())
    val eRows = exact.collect().map(_.toSeq).toSet
    val pRows = pruned.collect().map(_.toSeq).toSet
    assert(eRows == pRows && eRows.nonEmpty,
      s"pruned path diverged from exact: ${eRows.diff(pRows)} / ${pRows.diff(eRows)}")

    // the pruning is REAL: every user's bucket probe reaches only the
    // 12 A items (8 of them unrated), never the 24-item catalog
    val sigs = Content.signBands(feats, Content.LSH_SIGN_BITS, Content.LSH_SIGN_BANDS)
    val buckets = sigs.select("bucket").distinct().collect().map(_.getString(0)).toSet
    assert(buckets == Set("1111", "0000"), s"fixture bucket structure broke: $buckets")

    // plan hygiene: the LSH path must be all keyed joins — a
    // user×catalog grid would appear as a cartesian/nested-loop join
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"LSH candidate path contains a cartesian join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate path contains a nested-loop join:\n$plan")
  }

  test("hyperplane band geometry: deterministic, negation-complement buckets, wider bits split buckets, recommender output stays score-exact") {
    val s = spark
    import s.implicits._
    def vec(base: Double, itemId: Int): Seq[Double] =
      (1 to 16).map(d => base * (1.0 + 0.1 * ((itemId * d) % 7)))
    val aItems = (1 to 12).map(i => (i, vec(1.0, i)))
    val bItems = (101 to 112).map(i => (i, vec(-1.0, i)))
    val feats = (aItems ++ bItems).toDF("item_id", "fv")
    val ratings = (for {
      u <- 1 to 6
      j <- 1 to 4
    } yield (u, j, 1.0 + ((u * 7 + j) % 9) * 0.5)).toDF("user_id", "item_id", "rating")

    // (a) deterministic: two independent plans, identical signatures
    val sig1 = Content.hyperplaneBands(feats, 6, 4, 16).collect().map(_.toSeq).toSet
    val sig2 = Content.hyperplaneBands(feats, 6, 4, 16).collect().map(_.toSeq).toSet
    assert(sig1 == sig2 && sig1.nonEmpty)

    // (b) a vector and its negation project to complementary signs —
    // opposite-direction items can never share a bucket, whatever the
    // seed drew (proj(-v) = -proj(v))
    val sigs = Content.hyperplaneBands(feats, 6, 4, 16)
    val shared = sigs.filter(col("item_id") <= 12).as("a")
      .join(sigs.filter(col("item_id") >= 101).as("b"),
        Seq("band_id", "bucket"))
    assert(shared.count() == 0)

    // (c) widening bits only ever splits buckets: total distinct
    // (band, bucket) count is non-decreasing in bits — occupancy
    // control as the catalog grows is exactly this knob
    val occ = (bits: Int) => Content.hyperplaneBands(feats, bits, 4, 16)
      .select("band_id", "bucket").distinct().count()
    val counts = Seq(1, 3, 6).map(occ)
    assert(counts == counts.sorted, s"bucket count not monotone in bits: $counts")

    // (d) through the recommender seam: every recommendation the
    // hyperplane path emits carries EXACTLY the exact-grid score for
    // that (user, item) — candidate pruning may drop items (the LSH
    // recall trade) but can never corrupt a score. kItems=24 on the
    // exact side keeps every scored candidate, not just the top-5 cut
    val hyper = Content.contentTopK(ratings, feats, lit(true), 8, 5,
      source = Content.CandidateSource.LshBuckets(6, 4, hyperplaneDims = Some(16)))
    assert(hyper.select("user_id").distinct().count() == 6)
    val exactAll = Content.contentTopK(ratings, feats, lit(true), 8, 24)
      .select("user_id", "item_id", "score")
    val corrupted = hyper.select("user_id", "item_id", "score")
      .join(exactAll, Seq("user_id", "item_id", "score"), "left_anti")
    assert(corrupted.count() == 0,
      s"hyperplane path emitted a (u,i,score) absent from the exact scoring: ${corrupted.collect().mkString}")
  }

  test("Auto candidate source: boundary is exactly AUTO_EXACT_MAX_EVALS; Auto ≡ pinned ExactGrid below it") {
    val s = spark
    import s.implicits._
    // the pure decision rule at the measured crossover
    val max = Content.AUTO_EXACT_MAX_EVALS
    assert(Content.resolveAuto(1, max) == Content.CandidateSource.ExactGrid)
    assert(Content.resolveAuto(max, 1) == Content.CandidateSource.ExactGrid)
    assert(Content.resolveAuto(1, max + 1) == Content.CandidateSource.LshBuckets())
    assert(Content.resolveAuto(317, 317) == Content.CandidateSource.LshBuckets()) // 317² > 1e5
    assert(Content.resolveAuto(0, Long.MaxValue / 2) == Content.CandidateSource.ExactGrid) // empty cohort

    // end-to-end: a small job resolves to ExactGrid and the DEFAULT
    // (Auto) output is row-identical to the pinned exact grid
    val ratings = Seq((1, 1, 5.0), (1, 2, 1.0), (2, 2, 3.0)).toDF("user_id", "item_id", "rating")
    val feats = Seq(
      (1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)),
      (3, Seq(2.0, 0.0)), (4, Seq(0.0, 3.0))
    ).toDF("item_id", "fv")
    val auto = Content.contentTopK(ratings, feats, lit(true), 2, 2)
    val pinned = Content.contentTopK(ratings, feats, lit(true), 2, 2,
      source = Content.CandidateSource.ExactGrid)
    assert(auto.collect().map(_.toSeq).toSet == pinned.collect().map(_.toSeq).toSet)
  }

  test("fuseTopK normalizes each list by its OWN head score and sums") {
    val s = spark
    import s.implicits._
    val a = Seq((1, 10, 8.0, 1), (1, 11, 4.0, 2))
      .toDF("user_id", "item_id", "score", "rk")
    val b = Seq((1, 11, 2.0, 1), (1, 12, 1.0, 2))
      .toDF("user_id", "item_id", "score", "rk")
    val got = Hybrid.fuseTopK(a, b, wa = 0.6, wb = 0.4, kItems = 3)
      .orderBy("rk")
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getInt(3))).toSeq
    // item 10: 8/8·0.6 = 0.6; item 11: 4/8·0.6 + 2/2·0.4 = 0.7;
    // item 12: 1/2·0.4 = 0.2 — fusion reorders: 11 beats 10
    assert(got == Seq((11, 0.7, 1), (10, 0.6, 2), (12, 0.2, 3)))
  }

  test("contentTopK runs under every kernel of the SPI (K5 fallback intact)") {
    import graft.operators.Kernel
    val dir = "/root/testdata/sf0.001"
    val r = graft.sources.Tables.ratings(spark, dir)
    val feats = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("item_id"),
        col("embedding").cast("array<double>").as("fv"))
    val cohort = col("user_id") % 50 === 0
    val counts = Seq(Kernel.Cosine, Kernel.Pearson, Kernel.Jaccard,
      Kernel.InvEuclidean).map { k =>
      val recs = Content.contentTopK(r, feats, cohort, 8, 5, k)
      val n = recs.count()
      assert(recs.join(r, Seq("user_id", "item_id")).count() == 0, s"$k leaked seen items")
      k -> n
    }
    // every kernel produces a full top-5 slate for the same cohort
    assert(counts.map(_._2).distinct == Seq(counts.head._2), s"counts varied: $counts")
    assert(counts.head._2 > 0)
  }
}
