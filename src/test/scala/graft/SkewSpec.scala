package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting preserves join/agg semantics while widening the key. */
class SkewSpec extends SparkSuite {

  test("saltedJoin equals the plain join on a hot-key fixture") {
    val s = spark
    import s.implicits._
    // 90% of facts share key 1 — the melt-one-task shape
    val facts = ((1 to 90).map(i => (1, s"f$i")) ++ Seq((2, "x"), (3, "y")))
      .toDF("k", "payload")
    val dim = Seq((1, "hot"), (2, "warm"), (3, "cold")).toDF("k", "label")
    val plain = facts.join(dim, Seq("k"))
      .select("k", "payload", "label").collect().toSet
    val salted = Skew.saltedJoin(facts, dim, "k", nSalts = 8)
      .select("k", "payload", "label").collect().toSet
    assert(salted == plain)
    assert(salted.size == 92)
  }

  test("A/B on the q30 raters-join shape: salting removes the viral-item straggler partition") {
    val s = spark
    import s.implicits._
    // q30's expensive stage joins the cohort's (user, item) pairs
    // against ALL raters of each item, keyed on item_id. Under a
    // viral item that key melts one reducer: here item 99 carries
    // 900 of 1000 rating rows (the synthetic viral fixture the
    // round-4 verdict asked to demonstrate).
    val ratings = ((1 to 900).map(u => (u.toLong, 99L, 3.0 + u % 3)) ++
      (1 to 100).map(u => (u.toLong, (u % 20).toLong, 2.0 + u % 4)))
      .toDF("user_id", "item_id", "rating")
    val itemStats = ratings.groupBy("item_id")
      .agg(avg(col("rating")).as("imean"), count(lit(1)).as("n_raters"))

    val nSalts = 8
    def maxPartFrac(df: org.apache.spark.sql.DataFrame): Double = {
      val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
      sizes.max.toDouble / sizes.sum.max(1)
    }
    // force the shuffle-join path (broadcast would hide the skew) and
    // freeze AQE so partition sizes reflect the static plan the
    // salting targets
    val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val prevSp = s.conf.get("spark.sql.shuffle.partitions")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      // enough reducers that the 8 salted buckets rarely co-hash —
      // the suite default of 2 would remerge them by pigeonhole
      s.conf.set("spark.sql.shuffle.partitions", "64")
      val plain = ratings.join(itemStats, Seq("item_id"))
      val salted = Skew.saltedJoin(ratings, itemStats, "item_id", nSalts)

      // A: one partition carries ≥ the viral fraction of the output
      val plainMax = maxPartFrac(plain)
      assert(plainMax >= 0.85,
        s"fixture lost its straggler (max partition frac $plainMax)")
      // B: the hot key spreads over nSalts reducers — the worst
      // partition drops from ~90% of the rows to at most ~2 salt
      // buckets' worth (deterministic: the hash is seed-fixed;
      // measured 0.228 — two of the eight buckets co-hash at 64
      // reducers)
      val saltedMax = maxPartFrac(salted)
      assert(saltedMax <= 0.3 && saltedMax < plainMax / 2,
        s"salting left a straggler: max partition frac $saltedMax vs plain $plainMax")

      // semantics unchanged — same rows, viral fan-out included
      val a = plain.select("user_id", "item_id", "imean", "n_raters")
        .collect().map(_.toSeq).toSet
      val b = salted.select("user_id", "item_id", "imean", "n_raters")
        .collect().map(_.toSeq).toSet
      assert(a == b && a.size == 1000)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.shuffle.partitions", prevSp)
    }
  }

  test("saltedCount equals plain groupBy count") {
    val s = spark
    import s.implicits._
    val facts = ((1 to 90).map(i => (1, i)) ++ Seq((2, 0), (3, 0)))
      .toDF("k", "v")
    val got = Skew.saltedCount(facts, "k", nSalts = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == Map(1 -> 90L, 2 -> 1L, 3 -> 1L))
  }
}
