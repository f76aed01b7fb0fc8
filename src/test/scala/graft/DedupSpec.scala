package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** MinHash/normalization unit coverage for the dedup family. */
class DedupSpec extends SparkSuite {

  test("connectedComponents labels a chain, a pair and a singleton") {
    val s = spark
    import s.implicits._
    val nodes = (1L to 7L).toDF("doc_id")
    // chain 1-2-3-4, pair 5-6, singleton 7
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (6L, 5L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.connectedComponents(nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("normText collapses whitespace and case") {
    val df = spark.range(1).select(lit("  Foo   BAR\t baz ").as("text"))
    assert(df.select(Dedup.normText(col("text"))).head.getString(0) == "foo bar baz")
  }

  test("baseHash is the md5-prefix integer (portable across engines)") {
    val df = spark.range(1).select(lit("hello world").as("s"))
    // int(md5("hello world")[:7], 16) — precomputed independently
    assert(df.select(Dedup.baseHash(col("s"))).head.getLong(0) == 99312571L)
  }

  test("identical docs share all band hashes; disjoint docs share none") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different words appear in this other document here")
    ).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.VectorFns.shingles(
        graft.functions.VectorFns.tokens(Dedup.normText(col("text"))), 3)).as("s"))
      .distinct()
    val bands = Dedup.minhashBands(sh).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = bands.groupBy(_._1).view.mapValues(_.map(b => (b._2, b._3)).toSet)
    assert(byDoc(1L) == byDoc(2L))
    assert(byDoc(1L).intersect(byDoc(3L)).isEmpty)
    assert(byDoc(1L).size == Dedup.NUM_BANDS)
  }

  test("fuzzyPairs: FastSS candidates + verify = exact distance-1 set, no transposition false positives") {
    val s = spark
    import s.implicits._
    val names = Seq(
      "bolt",   // substitution neighbor of "bold"
      "bold",
      "bol",    // deletion neighbor of bolt AND bold
      "ab", "ba", // share deletion signature "b" but distance 2 — must be verified away
      "zzz",    // isolated
      "",       // empty string: Spark sequence(1,0) would yield [1,0], guard pins it to [""]
      "z"       // distance 1 from "" via deletion
    ).toDF("nm")
    val got = Dedup.fuzzyPairs(names, "nm").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // brute force over all pairs
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val all = Seq("bolt", "bold", "bol", "ab", "ba", "zzz", "", "z")
    val want = (for (a <- all; b <- all if a < b && lev(a, b) <= 1) yield (a, b)).toSet
    assert(got == want)
    assert(!got.contains(("ab", "ba")), "distance-2 transposition must not survive the verify")
    assert(got.contains(("bol", "bolt")) && got.contains(("bol", "bold")) &&
      got.contains(("bold", "bolt")))
  }

  test("dedup keep: one survivor per cluster, corpus size minus dup mass") {
    val keep = operators.Dedup.queries("q92_dedup_keep")(spark, "/root/testdata/sf0.001")
      .collect()
    val clusters = operators.Dedup.queries("q50_dedup_clusters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dupMass = clusters.values.map(_ - 1).sum
    assert(keep.count(_.getInt(2) == 1) == keep.length - dupMass,
      "kept = corpus - (cluster sizes - 1 survivor each)")
    // every cluster's canonical is kept, every other member dropped
    keep.groupBy(_.getLong(1)).foreach { case (canon, members) =>
      assert(members.count(_.getInt(2) == 1) == 1, s"cluster $canon")
      assert(members.filter(_.getInt(2) == 1).head.getLong(0) == canon)
    }
  }

  test("incremental dedup: exactly q20's cross-source duplicates, nothing else") {
    val dir = "/root/testdata/sf0.001"
    val srcOf = graft.sources.Tables.documents(spark, dir)
      .selectExpr("doc_id", "CAST(substring(source, 4, 10) AS INT) AS s")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val inc = operators.Dedup.queries("q95_incremental_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    inc.keys.foreach { case (n, e) =>
      assert(srcOf(n) >= operators.Dedup.INCREMENTAL_SPLIT &&
        srcOf(e) < operators.Dedup.INCREMENTAL_SPLIT, s"($n,$e) not cross-corpus")
    }
    // q20 emits ALL verified band-bucket pairs; the cross-source ones
    // at >= CLUSTER_JACCARD must be exactly q95's result, same scores
    val want = operators.Dedup.queries("q20_neardup_pairs")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .filter(_._2 >= operators.Dedup.CLUSTER_JACCARD)
      .flatMap { case ((a, b), j) =>
        if (srcOf(a) >= 10 && srcOf(b) < 10) Some((a, b) -> j)
        else if (srcOf(b) >= 10 && srcOf(a) < 10) Some((b, a) -> j)
        else None
      }.toMap
    assert(inc == want, s"got ${inc.size} want ${want.size}")
  }

  test("dupSpans: cross-doc span, within-doc adjacent merge, gap split, short-doc zeros") {
    val s = spark
    import s.implicits._
    val run = (1 to 8).map(i => s"w$i").mkString(" ") // the shared 8 tokens
    val docs = Seq(
      (1L, run + " u1 u2"),         // flagged pos 0 → 1 span, 8 covered / 10
      (2L, "x1 " + run + " y1 y2"), // flagged pos 1 → 1 span, 8 covered / 11
      (3L, run + " " + run),        // pos 0 & 8 ADJACENT (gap == n) → merge: 16/16
      (4L, "a1 b1 c1 d1 e1 f1 g1 h1 i1 j1"), // unique grams: zero spans
      (5L, "short doc")             // < 8 tokens: no grams, zeros
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((10L, 1L, 8L, 0.8)))
    assert(out(2L) == ((11L, 1L, 8L, 0.7273)))
    assert(out(3L) == ((16L, 1L, 16L, 1.0)), "adjacent windows merge into one maximal run")
    assert(out(4L) == ((10L, 0L, 0L, 0.0)))
    assert(out(5L) == ((2L, 0L, 0L, 0.0)))
  }

  test("dupSpans: a hole of one token splits two islands") {
    val s = spark
    import s.implicits._
    val runA = (1 to 8).map(i => s"a$i").mkString(" ")
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")
    // doc 3 repeats runA, a one-token hole, then runB (also repeated):
    // flagged starts 0 and 9 → gap 9 > n → two islands of 8 each
    val docs = Seq(
      (1L, runA), (2L, runB),
      (3L, runA + " hole " + runB)
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(3L) == ((17L, 2L, 16L, 0.9412)), s"got ${out(3L)}")
    // the 8-token docs themselves: their single gram is duplicated
    assert(out(1L) == ((8L, 1L, 8L, 1.0)))
    assert(out(2L) == ((8L, 1L, 8L, 1.0)))
  }

  test("spanScrub keeps exactly one occurrence of each duplicated run") {
    val s = spark
    import s.implicits._
    def fp16(text: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
    val runA = (1 to 8).map(i => s"a$i").mkString(" ")
    val runB = (1 to 8).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, runA + " u1 u2"),      // canonical owner of runA: untouched
      (2L, "x1 " + runA + " y1"), // loses the run → "x1 y1"
      (3L, runA + " " + runA),    // both occurrences non-canonical → empty
      (4L, runB + " z " + runB),  // within-doc: first copy canonical → runB + " z"
      (5L, "plain unrelated text here")
    ).toDF("doc_id", "text")
    val out = Dedup.spanScrub(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((10L, 10L, 0L, fp16(runA + " u1 u2"))),
      "canonical owner keeps its text verbatim")
    assert(out(2L) == ((10L, 2L, 8L, fp16("x1 y1"))), s"got ${out(2L)}")
    assert(out(3L) == ((16L, 0L, 16L, fp16(""))),
      "doc whose every token is a non-canonical duplicate scrubs to empty")
    assert(out(4L) == ((17L, 9L, 8L, fp16(runB + " z"))),
      "within-doc repeat keeps the first copy and the hole token")
    assert(out(5L) == ((4L, 4L, 0L, fp16("plain unrelated text here"))))
  }

  test("mapOnlyBands: row-local HOF signatures equal the groupBy-min band pipeline") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    // the batch long-form pipeline, built from the same public pieces
    val longForm = Dedup.minhashBands(
      docs.select(col("doc_id"),
        explode(graft.functions.VectorFns.shingles(
          graft.functions.VectorFns.tokens(Dedup.normText(col("text"))), 3)).as("s"))
        .distinct())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val mapOnly = Dedup.mapOnlyBands(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(mapOnly == longForm)
    assert(mapOnly.nonEmpty)
  }

  test("q126 impact report is exactly q50's clusters aggregated with real token masses") {
    import org.apache.spark.sql.functions.{col, size => asize}
    val dir = "/root/testdata/sf0.001"
    val clusters = graft.SparkEntry.queries("q50_dedup_clusters")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2).split(",").map(_.toLong)))
    val toks = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        asize(graft.functions.VectorFns.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = clusters
      .groupBy(_._2)
      .map { case (sz, cs) =>
        sz -> (cs.size.toLong, cs.map(_._2 - 1).sum,
          cs.map { case (canon, _, members) =>
            members.filter(_ != canon).map(toks).sum }.sum)
      }
    val out = graft.SparkEntry.queries("q126_dedup_impact")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out == expected)
    assert(out.nonEmpty, "sf0.001 has near-dup clusters; an empty report is a bug")
  }

  test("lshPlan: globally optimal over the budget, threshold-monotone, recall-biasable") {
    import graft.operators.Dedup
    // brute-force the same objective independently and require the
    // planner's error to be minimal over every (b, r) with b·r ≤ n
    def pCand(s: Double, b: Int, r: Int) =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    def errOf(tau: Double, b: Int, r: Int, wFp: Double, wFn: Double) = {
      val n = 4000 // finer grid than the planner's — catches bias
      (0 until n).map { i =>
        val s = (i + 0.5) / n
        val p = pCand(s, b, r)
        (if (s < tau) wFp * p else wFn * (1 - p)) / n
      }.sum
    }
    for (tau <- Seq(0.3, 0.5, 0.8); n <- Seq(16, 64, 128)) {
      val (b, r) = Dedup.lshPlan(tau, n)
      assert(b * r <= n, s"budget exceeded: $b x $r > $n")
      val mine = errOf(tau, b, r, 1, 1)
      for (rr <- 1 to n; bb <- 1 to n / rr)
        assert(mine <= errOf(tau, bb, rr, 1, 1) + 1e-3,
          s"tau=$tau n=$n: ($b,$r) beaten by ($bb,$rr)")
    }
    // steeper threshold → more rows per band (curve shifts right)
    val lowTau = Dedup.lshPlan(0.2, 128)._2
    val highTau = Dedup.lshPlan(0.8, 128)._2
    assert(lowTau < highTau, s"rows must grow with tau: $lowTau !< $highTau")
    // recall bias: weighting false negatives harder never loses recall
    // at the threshold itself
    val (b1, r1) = Dedup.lshPlan(0.5, 64)
    val (b2, r2) = Dedup.lshPlan(0.5, 64, fpWeight = 1.0, fnWeight = 10.0)
    assert(pCand(0.5, b2, r2) >= pCand(0.5, b1, r1) - 1e-12,
      "fn-weighted plan must not lose candidate probability at tau")
  }
}
