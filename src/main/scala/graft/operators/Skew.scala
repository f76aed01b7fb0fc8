package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-handling utilities (SURVEY §4 / the 100-TB brief: "skewed keys
 * → salting or AQE skew-join"). AQE's runtime skew split covers
 * sort-merge joins it can observe; explicit salting is the static
 * fallback for the cases it can't (broadcast-ineligible dimension
 * joins with a known-hot key, streaming joins, grouped aggs over a
 * dominant key).
 */
object Skew {

  /** Salted inner equi-join: the fact side gets a deterministic
    * per-row salt in [0, nSalts) (hash of the whole row — no RNG, so
    * replays and retries land identically), the dimension side is
    * replicated nSalts times, and the join key widens to
    * (key, salt) — one hot key now spreads over nSalts tasks instead
    * of melting one. Replication multiplies the dim shuffle by
    * nSalts: use for small-but-unbroadcastable dims or moderate n. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
                 nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val factCols = facts.columns.map(col)
    val salted = facts.withColumn("_salt",
      pmod(hash(factCols: _*), lit(nSalts)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation: count per (key, salt) first —
    * spreading a dominant key's rows over nSalts reducers — then
    * merge the partials per key. Spark's map-side partial aggregation
    * usually makes this redundant for algebraic aggs; the explicit
    * form matters when the combine step itself is heavy (collect_set
    * on a hot key) or partial agg is defeated by high upstream
    * cardinality. */
  def saltedCount(facts: DataFrame, key: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val factCols = facts.columns.map(col)
    facts.withColumn("_salt", pmod(hash(factCols: _*), lit(nSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))
  }

  /** Bloom-filter semi-join reduction: build one sketch over the dim
    * side's keys (`bloom_agg`, Catalyst's internal Bloom aggregate
    * surfaced by [[graft.GraftExtensions]]), broadcast the single-row
    * sketch, and pre-filter the fact side with `bloom_contains` BEFORE
    * any join shuffle. Never a false negative (every true match
    * survives — Bloom guarantees one-sided error), so an exact join
    * downstream returns exactly its unpruned result; false positives
    * only cost unpruned rows. This is the manual form of AQE's runtime
    * filter injection, for when the join is too far from the scan for
    * the optimizer to inject it: at 100 TB the win is shuffling only
    * the ~matching fraction of the fact table instead of all of it.
    * `numBits` sizes the sketch (8M bits ≈ 1 MB broadcast ≈ 1% FPR at
    * 1M keys). */
  private val bloomViewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  def bloomPrune(facts: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedItems: Long = 1000000L,
                 numBits: Long = 8388608L): DataFrame = {
    // might_contain demands the sketch as a constant or SCALAR SUBQUERY
    // (it must be fixed at planning, not a joined column), so the dim
    // rides a temp view and the sketch a subquery expression. The view
    // is dropped as soon as the filter is analyzed (Dataset creation
    // resolves the subquery eagerly), so repeated calls leave nothing
    // in the session catalog; identifiers are backquote-escaped so
    // column names with specials survive the SQL round-trip.
    def q(id: String) = "`" + id.replace("`", "``") + "`"
    val view = s"graft_bloom_dim_${bloomViewSeq.incrementAndGet()}"
    dim.select(col(dimKey)).createOrReplaceTempView(view)
    try {
      facts.filter(expr(
        s"bloom_contains((SELECT bloom_agg(${q(dimKey)}, ${expectedItems}L, " +
          s"${numBits}L) FROM $view), ${q(factKey)})"))
    } finally dim.sparkSession.catalog.dropTempView(view)
  }
}
