package graft

import org.apache.spark.sql.functions._
import graft.operators.Sequential

/** Hand-checkable fixtures for the R8/R9 stages: Lloyd assignment on
  * separable 2-D points, and pair-rule mining with recounted
  * support/confidence. */
class SequentialSpec extends SparkSuite {

  test("kmeansAssign separates two obvious 2-D clusters and converges") {
    val s = spark
    import s.implicits._
    // two tight blobs around (0,0) and (10,10); seeds 0 and 4 start
    // one in each blob
    val vecs = Seq(
      (0L, Seq(0.0, 0.1)), (1L, Seq(0.2, 0.0)), (2L, Seq(-0.1, 0.1)),
      (4L, Seq(10.0, 9.9)), (5L, Seq(9.8, 10.1)), (6L, Seq(10.2, 10.0))
    ).toDF("vec_id", "v")
    val got = Sequential.kmeansAssign(vecs, Seq(0L, 4L), iters = 2)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((0L, 0), (1L, 0), (2L, 0), (4L, 4), (5L, 4), (6L, 4)))
  }

  test("kmeansAssign distances are squared L2 to the final centroid") {
    val s = spark
    import s.implicits._
    // one cluster, one seed: final centroid is the mean (1.0, 2.0);
    // point (0,0) sits at squared distance 1+4 = 5
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(2.0, 4.0))
    ).toDF("vec_id", "v")
    val got = Sequential.kmeansAssign(vecs, Seq(0L), iters = 1)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == Seq((0L, 5.0), (1L, 5.0)))
  }

  test("pairRules support and confidence match hand counts") {
    val s = spark
    import s.implicits._
    // 10 baskets; {1,2} co-occur in 5 → support 0.5; item 1 appears in
    // 6 → confidence 5/6. Threshold max(4, ceil(10*0.004)=1) = 4 keeps
    // only the (1,2) pair (others co-occur ≤ 2 times).
    val rows =
      (1 to 5).flatMap(u => Seq((u, 1), (u, 2))) ++      // 5 baskets {1,2}
        Seq((6, 1), (6, 3), (7, 3), (8, 4), (9, 4), (10, 5))
    val r = rows.toDF("user_id", "item_id")
      .withColumn("rating", lit(1.0))
    val got = Sequential.pairRules(r).collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getDouble(2), x.getDouble(3))).toSeq
    assert(got == Seq((1, 2, 0.5, 0.833333)))
  }
}
