package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins q105's greedy keep-min-id semantics — deliberately NOT
  * transitive-closure components: in a chain a~b~c (with a~c below τ),
  * BOTH b and c drop — b against the kept a, and c against b even
  * though b itself was dropped. That is the published SemDeDup greedy
  * shape and what the oracle SQL replays. */
class SemanticDedupSpec extends SparkSuite {

  test("chain a~b~c drops b and c; a survives; counts match") {
    val sp = spark
    import sp.implicits._
    // one cell (single seed): cos(a,b)=0.9, cos(b,c)≈0.902, cos(a,c)=0.62
    val e = Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.9, 0.43589)),
      (3L, Seq(0.62, 0.78466))
    ).toDF("vec_id", "v")
    val out = Similarity.semanticDedup(e, Seq(1L), 0.7)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSeq ==
      Seq((1L, 0L, 1), (2L, 1L, 0), (3L, 1L, 0)), out.mkString("; "))
  }

  test("vectors in different cells never pair") {
    val sp = spark
    import sp.implicits._
    // seeds 1 and 2 define opposite cells; 3 and 4 are identical to a
    // seed each — identical vectors, but in different cells → both kept
    val e = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(-1.0, 0.0)),
      (3L, Seq(1.0, 0.0)), (4L, Seq(-1.0, 0.0))
    ).toDF("vec_id", "v")
    val out = Similarity.semanticDedup(e, Seq(1L, 2L), 0.99)
    // 3 pairs with 1 (same cell, cos 1.0) → dropped; 4 with 2 → dropped
    assert(out.filter(col("kept") === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    assert(out.filter(col("kept") === 1).count() == 2)
  }
}
