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
