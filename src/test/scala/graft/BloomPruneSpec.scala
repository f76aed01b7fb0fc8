package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Bloom semi-join reduction: one-sided error (never a false
  * negative), real pruning on a selective key set, and the plan shape
  * — the fact side sees only a broadcast of the 1-row sketch, no
  * keyed exchange before the filter. */
class BloomPruneSpec extends SparkSuite {

  test("bloomPrune never drops a true match and prunes most non-matches") {
    val s = spark
    import s.implicits._
    // dim keys are a 1% slice of the fact key space
    val facts = (1L to 20000L).map(i => (i % 10000L, s"f$i")).toDF("k", "payload")
    val dim = (0L until 100L).map(_ * 100L).toDF("k") // 100 of 10000 keys
    val pruned = Skew.bloomPrune(facts, "k", dim, "k",
      expectedItems = 100L, numBits = 65536L)

    // one-sided error: the exact join over pruned facts == over raw facts
    val exactRaw = facts.join(dim, "k").count()
    val exactPruned = pruned.join(dim, "k").count()
    assert(exactPruned == exactRaw, "bloom dropped a true match (false negative)")

    // pruning is real: kept rows ≈ matching fraction (plus bounded FP noise)
    val kept = pruned.count()
    val trueMatches = 200L // 100 keys × 2 fact rows each
    assert(kept >= trueMatches)
    assert(kept < 2000L, s"bloom kept $kept of 20000 — no real pruning")

    // plan: the sketch is a scalar subquery fixed at planning; the
    // fact side sees only a filter — no keyed exchange for the prune
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery") || plan.contains("might_contain"),
      s"sketch must plan as a scalar subquery:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"fact side must not shuffle for the prune:\n$plan")

    // hygiene: the helper temp view is dropped once the filter is
    // analyzed — repeated calls must not accumulate catalog entries,
    // and the already-returned DataFrame stays evaluable after drop
    Skew.bloomPrune(facts, "k", dim, "k", 100L, 65536L).count()
    val leftover = s.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_bloom_dim"))
    assert(leftover.isEmpty, s"bloom temp views leaked: ${leftover.mkString(",")}")
  }

  test("bloom_agg / bloom_contains SQL functions resolve via GraftExtensions") {
    val s = spark
    import s.implicits._
    (1L to 50L).toDF("v").createOrReplaceTempView("graft_bloom_probe")
    val hit = s.sql(
      """SELECT count(*) FROM (SELECT 7L AS probe)
        |WHERE bloom_contains(
        |  (SELECT bloom_agg(v, 50L, 4096L) FROM graft_bloom_probe),
        |  probe)""".stripMargin).collect()(0).getLong(0)
    assert(hit == 1L, "a present key must always hit")
  }
}
