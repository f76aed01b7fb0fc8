package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Fixed-point PageRank invariants the oracle hash can't express:
  * conservation of rank mass (up to the bounded integer-division
  * truncation) and the symmetric-cycle fixed point. */
class GraphSpec extends SparkSuite {

  test("ring graph: uniform rank is the exact fixed point") {
    val s = spark
    import s.implicits._
    val n = 10
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("src", "dst")
    val ranks = Graph.pageRankFixedPoint(edges, 5).collect()
      .map(r => r.getLong(1))
    // deg=1 everywhere: each iteration maps base -> teleport + 85%·base
    // identically for every node, so ranks stay exactly equal
    assert(ranks.toSet.size == 1, s"ring ranks diverged: ${ranks.toSeq}")
  }

  test("rank mass is conserved up to bounded truncation loss") {
    val s = spark
    import s.implicits._
    // star + chords, all symmetrized (every node has out-degree >= 1)
    val raw = Seq((1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (5, 1))
    val edges = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .map { case (a, b) => (a.toLong, b.toLong) }
      .toDF("src", "dst").distinct()
    val nNodes = 5
    val total = Graph.pageRankFixedPoint(edges, Graph.ITERS)
      .agg(sum(col("rank"))).collect()(0).getLong(0)
    // each division truncates < 1 unit per edge per iteration, each
    // damping step < 1 unit per node per iteration, plus the N·(SCALE/N)
    // base rounding — all ~1e1 units against SCALE = 1e12
    val maxLoss = Graph.ITERS.toLong * (raw.size * 2 + nNodes + 1) + nNodes
    assert(total <= Graph.SCALE && total >= Graph.SCALE - maxLoss * 100,
      s"mass not conserved: $total vs ${Graph.SCALE}")
  }

  test("triangles: fixture parity with brute force; hub wedges stay oriented-bounded") {
    val s = spark
    import s.implicits._
    // K4 on {1..4} (4 triangles), a pendant 5, and a hub 6 joined to
    // every K4 node but closing only the (1,2) edge
    val raw = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
      (1, 6), (2, 6), (3, 6), (4, 6))
      .map { case (a, b) => (a.toLong, b.toLong) }
    val und = raw.toDF("a", "b")
    val got = Graph.triangleCounts(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force over all node triples
    val nodes = raw.flatMap(e => Seq(e._1, e._2)).distinct
    val es = raw.toSet
    def edge(x: Long, y: Long) = es.contains((math.min(x, y), math.max(x, y)))
    val want = (for {
      i <- nodes; j <- nodes if i < j; k <- nodes if j < k
      if edge(i, j) && edge(j, k) && edge(i, k)
    } yield Seq(i, j, k)).flatten.groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    assert(got == want, s"got $got want $want")
    assert(!got.contains(5L), "pendant node joins no triangle")
  }

  test("triangle close auto-gate: boundary resolves both sides; closes agree") {
    // pure rule, both sides of the measured crossover
    assert(Graph.resolveBroadcastClose(Graph.TRI_BROADCAST_MAX_EDGES - 1),
      "just under the crossover must broadcast the close")
    assert(!Graph.resolveBroadcastClose(Graph.TRI_BROADCAST_MAX_EDGES),
      "at the crossover the close must shuffle")
    assert(!Graph.resolveBroadcastClose(Graph.TRI_BROADCAST_MAX_EDGES + 1))
    assert(Graph.resolveBroadcastClose(1L))
    // plan-only seam: identical output either side, and the auto form
    // (which broadcasts here — 11 edges) matches both
    val s = spark
    import s.implicits._
    val und = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
      (1, 6), (2, 6), (3, 6), (4, 6))
      .map { case (a, b) => (a.toLong, b.toLong) }.toDF("a", "b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bc = asMap(Graph.triangleCounts(und, broadcastClose = true))
    val sh = asMap(Graph.triangleCounts(und, broadcastClose = false))
    val auto = asMap(Graph.triangleCountsAuto(und))
    assert(bc == sh, s"close sides disagree: $bc vs $sh")
    assert(auto == bc, s"auto disagrees: $auto vs $bc")
  }

  test("label propagation: two cliques + a bridge resolve to two communities") {
    val s = spark
    import s.implicits._
    val clique = (xs: Seq[Long]) =>
      for (a <- xs; b <- xs if a < b) yield (a, b)
    val und = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
      ++ Seq((4L, 10L))).toDF("a", "b")
    val labels = Graph.labelPropagation(und, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = Seq(1L, 2L, 3L, 4L).map(labels)
    val c2 = Seq(11L, 12L, 13L).map(labels)
    assert(c1.distinct.length == 1, s"first clique must agree: $labels")
    assert(c2.distinct.length == 1, s"second clique must agree: $labels")
    assert(c1.head != c2.head, s"cliques must stay separate: $labels")
  }
}
