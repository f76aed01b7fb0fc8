package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * THE banded sign-signature implementation — one geometry shared by
 * every sign-LSH consumer (content candidate generation, embedding
 * near-dup pairs), so the codebook-widening option exists everywhere
 * banding does instead of per-operator forks.
 *
 * A signature is `bands` independent buckets; band b's bucket is the
 * "1"/"0" sign pattern of `bits` scalar projections of the vector
 * (strictly-positive = 1, the q49 convention). Two geometries:
 *
 *  - [[CoordinateAxes]]: band b bit i reads raw dim b·bits+i — zero
 *    arithmetic, but bits·bands ≤ dims caps the codebook at 2^dims
 *    buckets total.
 *  - [[Hyperplanes]]: Charikar random-hyperplane bits, sign(Σ_d
 *    h(b,i,d)·v[d]) with h ∈ [-1,1) from a fixed-seed PRNG. The
 *    coefficients are pure functions of literal (band, bit, dim)
 *    indices, computed driver-side ONCE and baked into the plan as
 *    literals — plain codegen arithmetic, deterministic across runs,
 *    engines and cluster topologies (never rand() in the plan), and
 *    bits·bands is unbounded: holding bucket occupancy flat as the
 *    catalog grows is a matter of widening `bits` by log2(growth).
 *
 * For collision purposes a pair qualifies if it shares ANY (band_id,
 * bucket) — the classic OR-amplification that lifts recall at the
 * same per-bucket cost (same construction as the MinHash banding in
 * Dedup.minhashBands, applied to hyperplane signs).
 */
object Banding {

  sealed trait Geometry
  case object CoordinateAxes extends Geometry
  final case class Hyperplanes(dims: Int, seed: Long = 42L) extends Geometry

  /** Explode `df` to one row per (input row, band): all input columns
    * survive, plus `band_id` (0-based) and `bucket` (the sign
    * pattern of `vec` under band b's projections). */
  def withBands(df: DataFrame, vec: Column, bits: Int, bands: Int,
                geometry: Geometry): DataFrame = {
    val bitExpr: (Int, Int) => Column = geometry match {
      case CoordinateAxes => (b, i) =>
        when(element_at(vec, b * bits + i + 1) > 0, lit("1")).otherwise(lit("0"))
      case Hyperplanes(dims, seed) =>
        val rng = new scala.util.Random(seed)
        // row-major draw order (band, bit, dim) is part of the
        // signature contract — oracle twins replay these literals
        val coefs = Array.fill(bands, bits, dims)(rng.nextDouble() * 2 - 1)
        (b, i) => {
          val proj = (0 until dims).map(d =>
            lit(coefs(b)(i)(d)) * element_at(vec, d + 1)).reduce(_ + _)
          when(proj > 0, lit("1")).otherwise(lit("0"))
        }
    }
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws("", (0 until bits).map(i => bitExpr(b, i)): _*).as("bucket"))
    }
    df.withColumn("__band", explode(array(bandStructs: _*)))
      .withColumn("band_id", col("__band.band_id"))
      .withColumn("bucket", col("__band.bucket"))
      .drop("__band")
  }
}
