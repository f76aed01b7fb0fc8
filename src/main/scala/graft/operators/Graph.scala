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
    "q76_pagerank" -> q76
  )

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
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val a = li.toDF("ok", "src")
    val b = li.toDF("ok", "dst")
    val edges = a.join(b, Seq("ok")).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    pageRankFixedPoint(edges, ITERS).toDF("part", "rank_fp")
  }

  /** Fixed-point PageRank over a directed edge list `(src, dst)` where
    * every node appears as a src (callers with dangling nodes must
    * symmetrize or pre-trim). Returns `(node, rank)` with rank in
    * integer [[SCALE]]-units. */
  def pageRankFixedPoint(edges0: DataFrame, iters: Int): DataFrame = {
    val edges = edges0.cache()
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
}
