package graft

import org.apache.spark.sql.functions._
import graft.streaming.{CorpusStreams, EventStreams, GateIndexes}

/** Gate-index lifecycle for multi-gate drivers (VERDICT r12 next #2/#3):
  * a driver running N concurrent ingest gates must be able to retire
  * ONE gate — `GateIndexes.release(pinGroup)` — without touching a
  * live gate's standing index (losing it silently reinstates the
  * ~34 s/batch re-derivation measured in
  * `probes/stream_ingest_probe_r12_prepin.json`), and the retired
  * group's blocks must actually leave the cache. The same registry now
  * also backs the BATCH semdedup increment's codebook pin, so a
  * compaction loop over growing standing corpora has a release path
  * instead of unbounded CacheManager accretion. */
class GateLifecycleSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Ids of RDDs currently registered persistent — the observable the
    * lifecycle contract is about: `release(group)` must remove the
    * retired group's ids and ONLY those. */
  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("batch semdedup: successive standing corpora pin under distinct groups; releasing the first retires only its codebook") {
    val S = graft.operators.Similarity
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // the `> -101L` style markers are numeric no-ops that make each
    // fixture's PLAN unique across the shared test JVM: CacheManager
    // dedups by plan, and an identical plan cached by an earlier
    // suite would make "a new persistent RDD appears" vacuously false
    val standingA = e.filter(col("vec_id") % S.SEM_INCR_MOD =!= S.SEM_INCR_MOD - 1)
      .filter(col("vec_id") > -101L)
    // the "compacted" second-generation standing corpus: A plus the
    // previously-incoming slice (a strictly different plan, so its
    // codebook is a NEW CacheManager entry — the accretion scenario)
    val standingB = e.filter(col("vec_id") > -102L)
    val incoming = e.filter(col("vec_id") % S.SEM_INCR_MOD === S.SEM_INCR_MOD - 1)

    val before = persistedIds
    val outA = S.semanticDedupIncrement(standingA, incoming, S.IVF_SEEDS,
      S.SEMDEDUP_TAU, pinGroup = "lifecycle-standA")
    val nA = outA.count()
    val idsA = persistedIds -- before
    assert(idsA.nonEmpty, "generation-A codebook must register a persistent RDD")

    val outB = S.semanticDedupIncrement(standingB, incoming, S.IVF_SEEDS,
      S.SEMDEDUP_TAU, pinGroup = "lifecycle-standB")
    outB.count()
    val idsB = persistedIds -- before -- idsA
    assert(idsB.nonEmpty,
      "generation-B codebook (distinct standing plan) must be a NEW cache entry")

    // compaction retires generation A: its blocks leave, B's survive
    GateIndexes.release("lifecycle-standA")
    assert((persistedIds & idsA).isEmpty,
      s"released group's codebook must leave the cache: ${persistedIds & idsA}")
    assert(idsB.subsetOf(persistedIds),
      "releasing generation A must not unpersist generation B's codebook")
    // the released generation still COMPUTES (recompute, not failure)
    assert(outA.count() == nA, "post-release re-run must recompute identically")
    GateIndexes.release("lifecycle-standB")
    assert((persistedIds & idsB).isEmpty, "generation-B release must drain too")
  }

  test("multi-gate driver: retiring one live gate leaves the survivor's index cached and its decisions intact") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val S = graft.operators.Similarity
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val semStanding = e.filter(col("vec_id") % S.SEM_INCR_MOD =!= S.SEM_INCR_MOD - 1)
      .filter(col("vec_id") > -103L)
    val semIncoming = e.filter(col("vec_id") % S.SEM_INCR_MOD === S.SEM_INCR_MOD - 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
    // distinct wording: an identical LocalRelation in another suite
    // would plan-dedup this gate's band/shingle pins away
    val ndStanding = Seq(
      (100L, "lifecycle alpha beta gamma delta epsilon zeta"),
      (101L, "lifecycle totally different standing content here"))
      .toDF("doc_id", "text")

    val before = persistedIds
    val semMem = MemoryStream[(Long, java.sql.Timestamp, Seq[Double])]
    val semQ = CorpusStreams.semdedupGateStream(
        semMem.toDF().toDF("vec_id", "ts", "v"), semStanding,
        S.IVF_SEEDS, S.SEMDEDUP_TAU, "1 hour", pinGroup = "lifecycle-sem")
      .writeStream.format("memory").queryName("lc_sem")
      .outputMode("append").start()
    val ndMem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val ndQ = EventStreams.neardupGateStream(
        ndMem.toDF().toDF("doc_id", "ts", "text"), ndStanding,
        watermark = "1 hour", pinGroup = "lifecycle-nd")
      .writeStream.format("memory").queryName("lc_nd")
      .outputMode("append").start()
    try {
      // batch 1 through BOTH gates — materializes both gates' pins
      val (semB1, semB2) = semIncoming.splitAt(semIncoming.length / 2)
      semMem.addData(semB1.map(x => (x._1, ts("2024-05-01 10:00:00"), x._2)).toSeq: _*)
      semQ.processAllAvailable()
      ndMem.addData((1L, ts("2024-05-01 10:00:00"), "lifecycle alpha beta gamma delta epsilon zeta"))
      ndQ.processAllAvailable()
      val afterBoth = persistedIds -- before
      assert(afterBoth.size >= 3,
        s"semdedup (1 pin) + neardup (2 pins) must all be live: $afterBoth")

      // retire the NEARDUP gate: stop its query, release ITS group
      ndQ.stop()
      GateIndexes.release("lifecycle-nd")
      val afterRelease = persistedIds -- before
      assert(afterRelease.size < afterBoth.size,
        "retiring the neardup gate must drop its standing band/shingle pins")
      assert((persistedIds & afterBoth).nonEmpty,
        "the survivor gate's cell index must STAY cached")

      // the survivor keeps deciding correctly on its next micro-batch
      // (its standing index was not collateral damage of the release)
      semMem.addData(semB2.map(x => (x._1, ts("2024-05-01 10:05:00"), x._2)).toSeq: _*)
      semQ.processAllAvailable()
      val expected = S
        .semanticDedupIncrement(semStanding,
          e.filter(col("vec_id") % S.SEM_INCR_MOD === S.SEM_INCR_MOD - 1),
          S.IVF_SEEDS, S.SEMDEDUP_TAU, pinGroup = "lifecycle-expected")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = sp.sql("SELECT vec_id, existing_vec_id FROM lc_sem")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"survivor diverged after peer release: only-stream=${got -- expected}, " +
          s"only-batch=${expected -- got}")
    } finally {
      if (ndQ.isActive) ndQ.stop()
      semQ.stop()
      GateIndexes.release("lifecycle-sem")
      GateIndexes.release("lifecycle-nd")
      GateIndexes.release("lifecycle-expected")
    }
  }

  test("shared-plan pins are ref-counted: releasing one of two groups pinning the SAME plan keeps the cache entry until the last release") {
    val sp = spark
    import sp.implicits._
    // CacheManager dedups persisted plans by sameResult, so both
    // groups' pins resolve to ONE storage entry; release() must not
    // evict it while the other group is still live (ADVICE r13)
    val shared = Seq((1L, "refcount"), (2L, "refcount two"))
      .toDF("doc_id", "text").filter(col("doc_id") > -104L)
    val before = persistedIds
    GateIndexes.pin(shared, "refcount-A")
    GateIndexes.pin(shared, "refcount-B")
    shared.count()
    val ids = persistedIds -- before
    assert(ids.nonEmpty, "the shared plan must register a persistent RDD")
    GateIndexes.release("refcount-A")
    assert(ids.subsetOf(persistedIds),
      "releasing group A must NOT evict the entry group B still pins")
    GateIndexes.release("refcount-B")
    assert((persistedIds & ids).isEmpty,
      "the last release must actually drain the shared entry")
  }

  test("default pinGroups are never shared: two gates of the same kind auto-pin under distinct fresh groups") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sp.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val standing = Seq((100L, "autogroup alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val groupsBefore = GateIndexes.liveGroups.toSet
    val mem1 = MemoryStream[(Long, java.sql.Timestamp, String)]
    val mem2 = MemoryStream[(Long, java.sql.Timestamp, String)]
    // building the gates registers the pins (pin() runs at build time)
    EventStreams.neardupGateStream(mem1.toDF().toDF("doc_id", "ts", "text"),
      standing, watermark = "1 hour")
    EventStreams.neardupGateStream(mem2.toDF().toDF("doc_id", "ts", "text"),
      standing, watermark = "1 hour")
    val fresh = GateIndexes.liveGroups.toSet -- groupsBefore
    assert(fresh.size == 2 && fresh.forall(_.startsWith("neardup#")),
      s"two default-group builds must take two distinct auto groups: $fresh")
    fresh.foreach(GateIndexes.release)
  }
}
