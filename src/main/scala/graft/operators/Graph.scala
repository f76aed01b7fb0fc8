package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/**
 * Iterative graph analytics beyond connected components
 * ([[Dedup.connectedComponents]]): PageRank in FIXED-POINT integer
 * arithmetic.
 *
 * Floating-point PageRank can never hash-match across engines — five
 * iterations of Σ rank/deg re-associate differently per plan. Scaling
 * ranks to integer micro-units (SCALE = 10¹²) makes every step —
 * integral division by out-degree, damping ×85 ÷100, exact integer
 * sums — bit-identical and order-independent in ANY engine, so the
 * whole iterative computation is DuckDB-oracle hash-checkable, not
 * just shape-checked. Precision loss is bounded by 1 unit per
 * division = 10⁻¹² of total mass per hop, far below ranking
 * relevance.
 *
 * Scale posture: the graph is edge-partitioned; each iteration is one
 * keyed join (rank onto edges) + one keyed sum — the textbook
 * distributed PageRank shape. Each iteration eagerly
 * `localCheckpoint`s the new rank vector: an unmaterialized iterative
 * fold re-executes early iterations 2^depth times (the q58/q50
 * lesson), and checkpointing only the |V|-row rank vector is cheap.
 */
object Graph {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_pagerank" -> q76,
    "q93_triangles" -> q93,
    "q97_label_propagation" -> q97
  )

  val LPA_ITERS = 3
  // LPA runs on the >= 2-support co-purchase graph: weight-1 edges are
  // single-order coincidences that fuse everything into one community
  val LPA_MIN_SUPPORT = 2

  val SCALE = 1000000000000L // 10^12 micro-units of rank mass
  val ITERS = 5
  val DAMP_NUM = 85L // damping 0.85 as an exact integer ratio
  val DAMP_DEN = 100L

  /** Item co-purchase PageRank: parts are nodes, an edge (a, b) exists
    * when some order contains both (pairs within an order are bounded
    * by order size, so the fan-out is per-order-quadratic but small
    * and NEVER all-pairs). Edges are symmetric by construction, so
    * every node has in- and out-degree ≥ 1 — no dangling-mass term. */
  private def q76(spark: SparkSession, dir: String): DataFrame = {
    val und = coPurchaseUndCached(spark, dir).select(col("a"), col("b"))
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
    pageRankFixedPoint(edges, ITERS).toDF("part", "rank_fp")
  }

  /** Session-cached undirected co-purchase edge list `(a, b, w)`,
    * a < b, w = number of orders containing both — q76 symmetrizes it
    * into its directed graph, q93 counts triangles on it, and q97
    * thresholds on w, so the per-order pair fan-out + count (the
    * expensive scan-side stage) runs ONCE per session via CacheManager
    * plan-dedup (the itemSimsCached pattern). */
  private[graft] def coPurchaseUndCached(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    li.toDF("ok", "a").join(li.toDF("ok", "b"), Seq("ok"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w")).cache()
  }

  /** Fixed-point PageRank over a directed edge list `(src, dst)` where
    * every node appears as a src (callers with dangling nodes must
    * symmetrize or pre-trim). Returns `(node, rank)` with rank in
    * integer [[SCALE]]-units. */
  def pageRankFixedPoint(edges0: DataFrame, iters: Int): DataFrame = {
    // cached PARTITIONED BY src (r15): the per-iteration rank join and
    // the degree aggregation are both src-keyed, so neither ever
    // re-exchanges the edge list — only the |V|-sized rank side moves
    // per iteration (§2.4; the contribution transpose's dst shuffle is
    // the one inherent exchange left)
    val edges = edges0.repartition(col("src")).cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
    val n = deg.count() // one tiny driver scalar: |V|
    val base = SCALE / n
    val teleport = (15L * base) / DAMP_DEN // (1-d)·(SCALE/N), exact
    var rank = deg.select(col("src").as("node"), lit(base).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(rank, edges("src") === rank("node"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("div(rank, deg)").as("c"))
      val sums = contribs.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      rank = deg.select(col("src").as("node"))
        .join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"div(${DAMP_NUM} * coalesce(s, 0L), ${DAMP_DEN})")).as("rank"))
        .localCheckpoint(true) // kill 2^depth lineage re-execution
    }
    rank
  }

  /** Per-node triangle counts over the item co-purchase graph, via
    * DEGREE-ORDERED wedge generation (the compact-forward scheme):
    * orient every undirected edge from its (degree, id)-smaller
    * endpoint, generate wedges only between a node's ORIENTED
    * out-neighbors, and close them against the undirected edge set.
    * Each triangle materializes exactly once (its (deg,id)-minimum
    * corner owns it), then explodes to credit all three corners.
    *
    * The orientation is the whole scale story: naive wedge counting is
    * Σᵥ C(deg v, 2) — quadratic in the hub degrees that dominate any
    * real co-occurrence graph — while oriented out-degrees are bounded
    * by O(√m), so wedge volume drops from hub-quadratic to
    * arboricity-bounded. Everything is keyed equi-joins; the closing
    * probe joins on the (lo, hi) edge key.
    *
    * The close strategy is SIZED, not assumed (VERDICT r8 task #2 —
    * the q32 `CandidateSource.Auto` discipline): one bounded scalar
    * count of the (already session-cached) edge list picks broadcast
    * vs shuffle close via [[resolveBroadcastClose]]. Plan-only — the
    * output set is identical either side, so the oracle hash never
    * moves with the choice. */
  private def q93(spark: SparkSession, dir: String): DataFrame =
    triangleCountsAuto(coPurchaseUndCached(spark, dir).select(col("a"), col("b")))
      .toDF("part", "n_triangles")

  /** The measured broadcast↔shuffle close crossover for
    * [[triangleCounts]], in edges (BASELINE §round-8,
    * `tools/TriScaleProbe`): at sf0.1 (~1.6 M edges) the broadcast
    * close is a clear win (the edge list is a dim-bounded catalog
    * co-occurrence graph); at sf1's 12.0 M edges the two sides price
    * inside each other's band (broadcast 37.2/66.9 s vs shuffle
    * 113.0/57.6 s) — i.e. sf1 sits AT the crossover, so the gate
    * flips there: a broadcast build × tasks of a ≥12 M-edge probe
    * table no longer beats one keyed shuffle of the wedge stream. */
  val TRI_BROADCAST_MAX_EDGES: Long = 12000000L

  /** [[triangleCountsAuto]]'s pure decision rule, exposed so the
    * boundary is unit-testable without building either plan: broadcast
    * the closing edge list iff it is strictly below
    * [[TRI_BROADCAST_MAX_EDGES]]. */
  def resolveBroadcastClose(nEdges: Long): Boolean =
    nEdges < TRI_BROADCAST_MAX_EDGES

  /** [[triangleCounts]] with the close side SIZED instead of assumed:
    * one bounded scalar count over the edge list (cache-idempotent —
    * callers hand in the session-cached co-purchase view, and
    * [[triangleCounts]] re-marks the same plan, so the count
    * materializes work the triangle job needs anyway) picks the
    * broadcast or shuffle close. */
  def triangleCountsAuto(und0: DataFrame): DataFrame = {
    val und = und0.cache()
    triangleCounts(und, broadcastClose = resolveBroadcastClose(und.count()))
  }

  /** Per-node triangle counts of an undirected edge list `(a, b)` with
    * `a < b` and no duplicates → `(node, n_triangles)`, nodes in ≥1
    * triangle only. See [[q93]] for the orientation argument.
    *
    * `broadcastClose` ships the edge list to every executor for the
    * closing probe, so the wedge stream (the big side — oriented
    * out-degree² rows) never shuffles. Only enable when the edge list
    * is genuinely dim-bounded (e.g. a catalog co-occurrence graph);
    * the default shuffle join is the safe posture for web-scale edge
    * lists. */
  def triangleCounts(und0: DataFrame, broadcastClose: Boolean = false): DataFrame = {
    val und = und0.cache()
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient a→b iff (deg a, a) < (deg b, b); a < b breaks degree ties
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"))
      // cached PARTITIONED BY u (r15): the wedge stage is a self-join
      // on u, so both sides read the one layout exchange-free (§2.4)
      .repartition(col("u"))
      .cache()
    val wedges = oriented.toDF("u", "v")
      .join(oriented.toDF("u", "w"), Seq("u"))
      .filter(col("v") < col("w"))
    val triangles = wedges.join(
      if (broadcastClose) broadcast(und) else und,
      col("v") === col("a") && col("w") === col("b"))
      .select(col("u"), col("v"), col("w"))
    triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Community detection by SYNCHRONOUS label propagation over the
    * co-purchase graph: every node starts as its own label; each round
    * every node adopts the most frequent label among its neighbors,
    * ties broken by the smallest label — fully deterministic, unlike
    * the classic randomized-order LPA, so the whole iterative
    * computation hash-matches an unrolled-CTE oracle (the q76
    * posture). Fixed [[LPA_ITERS]] rounds: LPA has no fixed point in
    * general (labels can oscillate on bipartite-ish structure), so a
    * bounded round count IS the algorithm. Distinct from
    * [[Dedup.connectedComponents]]: min-label CC merges everything
    * reachable; frequency-vote LPA finds dense communities INSIDE one
    * component.
    *
    * Each round is one keyed join (labels onto the symmetrized edges)
    * + one (node, label) count + one all-integer argmax via
    * max(struct(cnt, −label)) — no window, no global sort;
    * localCheckpoint per round kills the 2^depth lineage. */
  private def q97(spark: SparkSession, dir: String): DataFrame =
    labelPropagation(coPurchaseUndCached(spark, dir)
        .filter(col("w") >= LPA_MIN_SUPPORT).select(col("a"), col("b")),
      LPA_ITERS)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"))

  /** Library surface of [[q97]]: `iters` rounds of deterministic
    * synchronous LPA over an undirected edge list `(a, b)` →
    * `(node, label)`. */
  def labelPropagation(und: DataFrame, iters: Int): DataFrame = {
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to iters) {
      labels = edges
        .join(labels, edges("src") === labels("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("dst").as("node"), (-col("m.neg")).as("label"))
        .localCheckpoint(true)
    }
    labels
  }
}
