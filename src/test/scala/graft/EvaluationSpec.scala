package graft

import org.apache.spark.sql.functions._
import graft.operators.Evaluation

/** Hand-computed fixture for the E1-E3 ranking-metrics library
  * surface — pins the reference's AP@k quirk (EVERY prefix counted,
  * not only hit positions; divisor k) and the E2 empty-relevant
  * guard, independent of the oracle-checked q27 pipeline. */
class EvaluationSpec extends SparkSuite {

  test("rankingMetricsAt matches hand-computed P/R/AP@3") {
    val s = spark
    import s.implicits._
    // user 1: recs [10, 20, 30], relevant {10, 30, 99}
    //   hits at rk 1 and 3 → prec@3 = 2/3; recall = 2/3
    //   AP@3 (all-prefix) = (1/1 + 1/2 + 2/3) / 3 = 0.7222
    // user 2: recs [40, 50, 60], relevant {50}
    //   prec = 1/3; recall = 1; AP = (0/1 + 1/2 + 1/3) / 3 = 0.2778
    // user 3: recs [70, 80, 90], NO relevant pairs
    //   prec = 0; recall = 0 (E2 guard); AP = 0
    val recs = Seq(
      (1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 40L, 1), (2L, 50L, 2), (2L, 60L, 3),
      (3L, 70L, 1), (3L, 80L, 2), (3L, 90L, 3)
    ).toDF("user_id", "item_id", "rk")
    val rel = Seq((1L, 10L), (1L, 30L), (1L, 99L), (2L, 50L))
      .toDF("user_id", "item_id")

    val m = Evaluation.rankingMetricsAt(recs, rel, 3).collect()(0)
    val wantPrec = ((2.0 / 3) + (1.0 / 3) + 0.0) / 3
    val wantRec = ((2.0 / 3) + 1.0 + 0.0) / 3
    val wantMap = ((1.0 + 0.5 + 2.0 / 3) / 3 + (0.5 + 1.0 / 3) / 3 + 0.0) / 3
    assert(math.abs(m.getDouble(0) - wantPrec) < 5e-5, s"prec ${m.getDouble(0)}")
    assert(math.abs(m.getDouble(1) - wantRec) < 5e-5, s"rec ${m.getDouble(1)}")
    assert(math.abs(m.getDouble(2) - wantMap) < 5e-5, s"map ${m.getDouble(2)}")
  }
}
