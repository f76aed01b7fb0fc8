package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Corpus}

/** Library-surface checks for the analytics batch (hopping windows,
  * cube, z-score outliers) and the corpus decontamination / TF-IDF
  * operators: fixture semantics plus the plan shapes the 100-TB
  * posture depends on. The hash-exact gates are the q78–q84 DuckDB
  * oracles. */
class AnalyticsSpec extends SparkSuite {

  test("hopping window: every row lands in exactly two 2d/1d windows") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:00:00"), 10.0),
      (2L, Timestamp.valueOf("2024-01-02 23:59:59"), 20.0),
      (3L, Timestamp.valueOf("2024-01-02 00:00:00"), 30.0) // exact boundary
    ).toDF("event_id", "ts", "value")
    val out = ev.groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(sum(col("value")).as("sv"), count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("ws"), col("sv"), col("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // row 1 ∈ {12-31, 01-01}; rows 2,3 ∈ {01-01, 01-02} (the 01-02
    // 00:00:00 boundary opens the 01-02 window, closes none early)
    assert(out("2023-12-31 00:00:00") == ((10.0, 1L)))
    assert(out("2024-01-01 00:00:00") == ((60.0, 3L)))
    assert(out("2024-01-02 00:00:00") == ((50.0, 2L)))
    assert(out.values.map(_._2).sum == 2 * ev.count())
  }

  test("cube: one Expand feeds all four granularities in a single pass") {
    val df = Analytics.queries("q80_cube")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("Expand").length - 1 == 1, s"want exactly 1 Expand:\n$plan")
    assert(plan.split("Scan parquet").length - 1 == 1, "one scan of the fact table")
    val rows = df.collect()
    val total = rows.filter(r => r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(total.length == 1, "exactly one grand-total row")
    assert(total.head.getLong(4) ==
      rows.filter(r => r.getInt(2) == 0 && r.getInt(3) == 0).map(_.getLong(4)).sum,
      "grand total = sum of finest cells")
  }

  test("z-score outliers: brute-force parity and broadcast stats dim") {
    val s = spark
    import s.implicits._
    val df = Analytics.queries("q83_zscore_outliers")(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "per-type moment stats must ride a broadcast, never shuffle the facts")
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // brute-force the same moments in driver scala (exact on 6dp-quantized values)
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,6)").cast("double").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = ev.groupBy(_._2)
    val want = ev.flatMap { case (id, t, v) =>
      val vs = byType(t).map(_._3)
      val mu = vs.sum / vs.length
      val sigma = math.sqrt(vs.map(x => x * x).sum / vs.length - mu * mu)
      val z = (v - mu) / sigma
      if (math.abs(z) > Analytics.Z_THRESH) Some(id -> z) else None
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, z) => assert(math.abs(z - want(id)) < 1e-3) }
  }

  test("decontaminate flags gram overlap with the hash-selected bench set") {
    val s = spark
    import s.implicits._
    // ids 3,5,6 are bench (md5 bucket < 5); 1,2 are corpus
    val phrase = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (3L, phrase + " ending one"),
      (1L, "prefix words " + phrase), // shares the 5-grams inside `phrase`
      (2L, "totally different words with no shared five gram anywhere here")
    ).toDF("doc_id", "text")
    val out = Corpus.decontaminate(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(1L), "only the overlapping corpus doc is flagged")
    assert(out(1L) == 2, "two shared 5-grams inside the 6-token phrase")
  }

  test("quantile buckets: quartiles balance within rounding; bounds dim broadcasts") {
    val df = Analytics.queries("q86_quantile_buckets")(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the per-group boundary dim must broadcast, never shuffle the facts")
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val byType = rows.groupBy(_._1._1)
    byType.foreach { case (t, cells) =>
      assert(cells.keySet.map(_._2) == Set(1, 2, 3, 4), s"$t missing a quartile")
      val total = cells.values.sum.toDouble
      cells.values.foreach(n =>
        assert(math.abs(n / total - 0.25) < 0.05, s"$t buckets unbalanced: $cells"))
    }
  }

  test("quality checks: one deliberate failure, rest pass, still one scan") {
    val df = Analytics.queries("q87_quality_checks")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert("FileScan|BatchScan".r.findAllMatchIn(plan).size == 1,
      s"all three check families must ride ONE profile pass:\n$plan")
    val rows = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(rows.size == 12) // 7 completeness + 3 distinct + 2 domain
    val failed = rows.filter(_._2 == 0).keySet
    assert(failed == Set(("l_returnflag", "distinct_bounds")),
      s"exactly the planted rule must fail, got: $failed")
  }

  test("decontaminate: the eval-gram side broadcasts; corpus never shuffles on the gram key") {
    val df = Corpus.queries("q81_decontaminate")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bench grams must ride a broadcast:\n$plan")
  }

  test("tfidf top terms: rare-but-frequent-in-doc term wins; stopword-like term scores 0") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "rare rare rare common"),
      (2L, "common other other"),
      (3L, "common filler filler filler")
    ).toDF("doc_id", "text")
    val out = Corpus.tfidfTopTerms(docs, topK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3))).toMap
    assert(out((1L, 1))._1 == "rare")
    // 'common' appears in every doc → ln(N/df) = ln(1) = 0 exactly
    assert(out((1L, 2)) == (("common", 0.0)))
    assert(out((2L, 1))._1 == "other" && out((3L, 1))._1 == "filler")
  }

  test("corr matrix: decimal-moment coefficients match built-in corr; one scan, one agg row") {
    val df = Analytics.queries("q88_corr_matrix")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"all 15 moments must ride ONE scan:\n$plan")
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6 && got.values.forall(c => c >= -1.0 && c <= 1.0))
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
    got.foreach { case ((x, y), c) =>
      val ref = li.agg(corr(col(x), col(y))).head.getDouble(0)
      // q88 emits at 6 dp — parity holds to the rounding half-ulp
      assert(math.abs(c - ref) < 1e-6, s"($x,$y): $c vs corr()=$ref")
    }
  }

  test("gap fill: dense user×day grid, carry = last observed, no unpartitioned window") {
    val df = Analytics.queries("q89_gap_fill")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // both windows partition by user_id — no global-sort window (the
    // scalar span agg legitimately reduces to one row; windows must not)
    plan.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("windowspecdefinition(user_id"),
        s"window must partition by user_id: $l")
    }
    val rows = df.collect()
    val users = rows.map(_.getLong(0)).distinct
    val days = rows.map(_.get(1)).distinct
    assert(rows.length == users.length * days.length, "grid must be dense")
    // per user: walking days in order, value changes only on observed rows
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      var carry = 0.0
      rs.sortBy(_.get(1).toString).foreach { r =>
        if (r.getInt(3) == 1) carry = r.getDouble(2)
        assert(r.getDouble(2) == carry, s"fill must equal last observed: $r")
      }
    }
  }

  test("scd2: intervals chain per customer with exactly one open version") {
    val df = Analytics.queries("q90_scd2")(spark, "/root/testdata/sf0.001")
    val rows = df.collect().groupBy(_.getLong(0))
    rows.foreach { case (cust, rs) =>
      val sorted = rs.sortBy(_.getInt(4)) // version order
      assert(sorted.map(_.getInt(4)).toSeq == (1 to rs.length), s"dense versions for $cust")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(6) == b.get(5),
            s"valid_to must chain to next valid_from for $cust")
        case _ =>
      }
      assert(sorted.count(_.getInt(7) == 1) == 1, s"exactly one current row for $cust")
      assert(sorted.last.getInt(7) == 1 && sorted.last.isNullAt(6))
    }
  }

  test("pit join: every probe carries the version live at ship time, never a later one") {
    import java.time.LocalDateTime
    val dir = "/root/testdata/sf0.001"
    val scd = Analytics.queries("q90_scd2")(spark, dir).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        (r.getInt(4), r.getAs[LocalDateTime](5))).sortBy(_._1)).toMap
    val pit = Analytics.queries("q101_pit_join")(spark, dir).collect()
    assert(pit.nonEmpty)
    pit.foreach { r =>
      val (cust, ship, got) = (r.getLong(0), r.getAs[LocalDateTime](2), r.getInt(3))
      // brute force: the max version whose valid_from <= ship_ts
      val want = scd(cust).filter(!_._2.isAfter(ship))
        .map(_._1).maxOption.getOrElse(0)
      assert(got == want, s"cust $cust ship $ship: got v$got want v$want")
    }
    // the interesting cases actually occur: early ship dates see v0 or
    // an old version, i.e. not every probe lands on the final version
    val finals = scd.view.mapValues(_.map(_._1).max)
    assert(pit.exists(r => r.getInt(3) < finals(r.getLong(0))),
      "fixture must exercise non-final versions")
  }

  test("plan hygiene for the late-round operators: no cartesians, keyed windows only") {
    val dir = "/root/testdata/sf0.001"
    // queries whose scale posture forbids any unkeyed pair blow-up
    val noCartesian = Seq("q93_triangles", "q95_incremental_dedup",
      "q97_label_propagation", "q100_corpus_pipeline", "q101_pit_join",
      "q90_scd2", "q94_lm_quality")
    noCartesian.foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$q plans a cartesian:\n${plan.take(2000)}")
      // every window must carry a partition spec: in the plan text an
      // unpartitioned window's FIRST windowspecdefinition argument is
      // an ORDER column (carries ASC/DESC); partition columns are bare
      """windowspecdefinition\(([^,)]*)""".r.findAllMatchIn(plan).foreach { m =>
        assert(!m.group(1).contains(" ASC") && !m.group(1).contains(" DESC"),
          s"$q has an unpartitioned window: ${m.matched}")
      }
    }
    // q93's closing probe rides the requested broadcast
    val tri = SparkEntry.queries("q93_triangles")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(tri.contains("BroadcastHashJoin"),
      s"q93 closing probe must broadcast:\n${tri.take(1500)}")
  }

  test("ab test: strong lift is significant, no lift scores z=0, assignment deterministic") {
    val s = spark
    import s.implicits._
    val pop = (1L to 400L).toDF("user_id")
    // which arm each user hashes into (read off one run — deterministic)
    val arms = pop.select(col("user_id"),
      (graft.operators.Dedup.baseHash(concat(col("user_id").cast("string"),
        lit("_ab"))) % 2).cast("int").as("arm"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // biased world: 80% of arm-1 converts, 20% of arm-0 (by hash order)
    val conv = arms.toSeq.filter { case (u, a) =>
      if (a == 1) u % 5 != 0 else u % 5 == 0
    }.map(_._1).toDF("user_id")
    val out = Analytics.abTest(pop, conv).head()
    assert(out.getInt(7) == 1, s"strong lift must be significant: $out")
    assert(out.getDouble(6) > Analytics.AB_Z_CRIT, s"z must be positive: $out")
    // identical conversion in both arms → z exactly 0 via the guard path
    val all = Analytics.abTest(pop, pop.select("user_id")).head()
    assert(all.getDouble(6) == 0.0 && all.getInt(7) == 0,
      s"pp=1 pool must read z=0, not a 0-variance division: $all")
    // rerun → identical assignment counts (determinism)
    val again = Analytics.abTest(pop, conv).head()
    assert(again == out)
  }

  test("ab test: a one-user population (one empty arm) reads z=0 and a null rate, not a division error") {
    val s = spark
    import s.implicits._
    val pop = Seq(1L).toDF("user_id")
    val out = Analytics.abTest(pop, pop.select("user_id")).head()
    assert(out.getLong(0) + out.getLong(2) == 1L, s"one user, two arms? $out")
    assert(out.getDouble(6) == 0.0 && out.getInt(7) == 0,
      s"empty arm must read z=0: $out")
    // exactly one arm has a rate; the empty arm's rate is null
    assert(out.isNullAt(4) ^ out.isNullAt(5), s"empty arm rate must be null: $out")
  }

  test("ewma: hand-computed 3-step series; head rows normalize by observed weight mass") {
    val s = spark
    import s.implicits._
    val daily = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 20.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 30.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 7.0)
    ).toDF("user_id", "day", "day_value")
    val out = Analytics.ewma(daily).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(10)) -> r.getDouble(3))
      .toMap
    assert(out((1L, "2024-01-01")) == 10.0)
    // (20 + 10*0.8) / 1.8
    assert(out((1L, "2024-01-02")) == 15.5556)
    // (30 + 20*0.8 + 10*0.64) / 2.44
    assert(out((1L, "2024-01-03")) == 21.4754)
    assert(out((2L, "2024-01-05")) == 7.0, "singleton series is its own smoother")
  }

  test("shardPlan: shards tile the corpus, bounded overflow, repartition-stable") {
    val s = spark
    import s.implicits._
    // token counts 1..20 across two sources
    val docs = (1L to 40L).map { i =>
      val n = (i % 20 + 1).toInt
      (i, s"src${i % 2}", (1 to n).map(k => s"t$k").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val target = 25L
    val out = Analytics.shardPlan(docs, target).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalToks = (1L to 40L).map(i => i % 20 + 1).sum
    assert(out.map(_._3).sum == 40L, "every doc lands in exactly one shard")
    assert(out.map(_._4).sum == totalToks, "token mass is conserved")
    // a shard overflows its target by at most one document's tokens
    assert(out.forall(_._4 <= target + 20), s"overflow bound violated: ${out.mkString(",")}")
    // shard ids are contiguous from 0 within each source
    out.groupBy(_._1).foreach { case (src, rows) =>
      val ids = rows.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length.toLong), s"$src ids not contiguous: $ids")
    }
    // layout is physical-order independent
    val again = Analytics.shardPlan(docs.repartition(7), target).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sortBy(x => (x._1, x._2)).toSeq == again.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("q119 plan shape: two windows (bucketed cumsum + tiny offsets), offsets broadcast back") {
    val df = graft.SparkEntry.queries("q119_shard_plan")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val nWindows = "Window \\[".r.findAllIn(plan).size
    assert(nWindows == 2, s"expected the two-level decomposition's 2 windows, got $nWindows:\n$plan")
    assert(plan.contains("bkt"), s"cumsum window must partition by the hkey-prefix bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets (<=4096 rows/source) must broadcast:\n$plan")
  }

  test("q138 plan shape: bucketed rank window + broadcast offsets; quota exact per source") {
    val df = graft.SparkEntry.queries("q138_source_quota")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val nWindows = "Window \\[".r.findAllIn(plan).size
    assert(nWindows == 2, s"expected the two-level decomposition's 2 windows, got $nWindows:\n$plan")
    assert(plan.contains("bkt"), s"rank window must partition by the hkey-prefix bucket:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket-count offsets must broadcast:\n$plan")
    // semantic invariants: kept == min(quota, |source|) per source and
    // qrank is a dense 1..n permutation within each source
    val rows = df.collect().map(r =>
      (r.getString(1), r.getLong(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val kept = rs.count(_._3 == 1)
      assert(kept == math.min(graft.operators.Analytics.SOURCE_QUOTA, rs.length),
        s"$src kept $kept of ${rs.length}")
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq,
        s"$src qrank not a dense permutation")
    }
  }

  test("shardPlan: two-level prefix sum equals the naive single-window plan") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // single source — the case where the naive per-source window
    // serializes everything and the bucket decomposition must still
    // reproduce its exact running order
    val docs = (1L to 300L).map { i =>
      (i, "only", (1 to (i % 13 + 1).toInt).map(k => s"w$k").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val toks = docs.select(col("doc_id"), col("source"),
      size(graft.functions.VectorFns.tokens(col("text"))).cast("long").as("n_tok"),
      graft.operators.Dedup.baseHash(concat(col("doc_id").cast("string"),
        lit("_shard"))).as("hkey"))
    val w = Window.partitionBy(col("source")).orderBy(col("hkey"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = toks
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("shard_id", expr(s"(cum - n_tok) DIV 25"))
      .groupBy(col("source"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("shard_tokens"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val twoLevel = Analytics.shardPlan(docs, 25L)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(naive.toSeq == twoLevel.toSeq)
  }
}
