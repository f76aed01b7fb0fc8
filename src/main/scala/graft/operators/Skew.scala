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
}
