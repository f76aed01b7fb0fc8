package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine-stable decimal rounding.
 *
 * Spark's `round()` on a double routes through the value's shortest
 * decimal representation (`BigDecimal.valueOf` = `Double.toString`,
 * then HALF_UP), while DuckDB rounds the binary value directly. A
 * double whose shortest repr terminates in an exact half at the target
 * scale — common for averages over power-of-two counts, e.g.
 * 307.03/8 → "38.37875" — rounds UP in Spark and DOWN in DuckDB,
 * flipping the oracle hash.
 *
 * `floor(x·10ᵈ + 0.5)/10ᵈ` avoids the divergence: every step is plain
 * IEEE-754 double arithmetic that both engines evaluate bit-identically.
 * All oracle SQL must use the literal `floor(x * 10000.0 + 0.5) / 10000.0`
 * form (see the `sql4`/`sql6` helpers for fragments).
 */
object Rounding {

  /** Round to 4 dp (the repo-wide emit convention), engine-stable. */
  def r4(c: Column): Column = floor(c * lit(1e4) + lit(0.5)) / lit(1e4)

  /** Round to 6 dp (rank-key convention for similarities), engine-stable. */
  def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** DuckDB fragment equivalent of [[r4]]. */
  def sql4(expr: String): String = s"floor(($expr) * 10000.0 + 0.5) / 10000.0"

  /** DuckDB fragment equivalent of [[r6]]. */
  def sql6(expr: String): String = s"floor(($expr) * 1000000.0 + 0.5) / 1000000.0"
}
