package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout: Z-order (Morton-curve) clustering.
 *
 * A table range-partitioned and sorted on ONE column skips files well
 * for predicates on that column and not at all for any other — every
 * x-stripe spans the full y range, so a 2-D box predicate intersects
 * every file's min/max envelope. Interleaving the bits of both
 * dimensions into one z-value and range-partitioning on THAT gives
 * every file a small axis-aligned envelope in BOTH dimensions, so
 * parquet min/max (file- and row-group-level) pruning works for
 * either column alone or both together — the lever behind
 * Delta/Iceberg `OPTIMIZE ZORDER BY` at 100 TB, here as a plain
 * DataFrame transform.
 *
 * Everything is narrow map work except the final `repartitionByRange`
 * (one range-exchange — the same shuffle a single-column layout pays);
 * the z-value is a pure codegen'd bit-twiddling expression.
 */
object Layout {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * bit b of `x` lands at position 2b, bit b of `y` at 2b+1. Pure
    * closed-form bitwise expression — whole-stage-codegen friendly,
    * no UDF. */
  def interleaveBits(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)

  val Z_BITS = 16

  /** Scale a double/numeric column into [0, 2^bits) by its global
    * min/max (broadcast one tiny stats row), as a long. Constant
    * columns map to 0. */
  private def scaled(c: Column, cmin: Column, cmax: Column, bits: Int): Column = {
    val span = cmax - cmin
    val unit = when(span === 0, lit(0.0))
      .otherwise((c - cmin).cast("double") / span.cast("double"))
    least(floor(unit * lit((1L << bits).toDouble)), lit((1L << bits) - 1))
      .cast("long")
  }

  /** Cluster `df` on the Z-curve over two columns: compute global
    * min/max of both (one scalar agg, broadcast), scale each to
    * [[Z_BITS]]-bit ints, interleave, then `repartitionByRange` +
    * `sortWithinPartitions` on the z-value so every output partition
    * (→ parquet file) owns a contiguous z-range = a small 2-D
    * envelope. The z column is dropped from the result; callers
    * `.write.parquet` the returned frame. */
  def zcluster(df: DataFrame, cx: String, cy: String, numFiles: Int): DataFrame = {
    val stats = df.agg(
      min(col(cx)).as("xmin"), max(col(cx)).as("xmax"),
      min(col(cy)).as("ymin"), max(col(cy)).as("ymax"))
    val z = interleaveBits(
      scaled(col(cx), col("xmin"), col("xmax"), Z_BITS),
      scaled(col(cy), col("ymin"), col("ymax"), Z_BITS), Z_BITS)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "xmin", "xmax", "ymin", "ymax")
  }

  /** [[zcluster]] with caller-supplied bounds — for callers whose
    * frame is expensive to execute (a compaction fold): [[zcluster]]
    * derives the bounding box from `df` itself, which re-executes the
    * plan once for the stats agg; here the caller computes bounds
    * from the CHEAP sides (a 2-column pruned scan of the standing
    * snapshot ∪ the batch-sized delta bounds the fold's rows from
    * above, since a fold only removes rows) and the big plan executes
    * exactly once, in the write. A superset bounding box only
    * coarsens cell granularity at the margins; z-ordering and range
    * contiguity are unaffected. */
  def zclusterBounded(df: DataFrame, cx: String, cy: String, numFiles: Int,
      xmin: Double, xmax: Double, ymin: Double, ymax: Double): DataFrame =
    df.withColumn("__z", interleaveBits(
        scaled(col(cx), lit(xmin), lit(xmax), Z_BITS),
        scaled(col(cy), lit(ymin), lit(ymax), Z_BITS), Z_BITS))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Small-file compaction — the maintenance pass every long-lived
    * 100-TB table needs: streaming/incremental writers leave thousands
    * of KB-scale files whose per-file open/footer cost dominates scan
    * time. Rewrite a directory into ⌈rows / targetRowsPerFile⌉ files:
    * ONE count pass (column-pruned to nothing by parquet metadata),
    * one round-robin repartition, one rewrite to a new directory —
    * never in place, so readers of the old layout are never broken
    * (swap is the caller's atomic-rename/metastore step). Partitioned
    * tables compact per partition directory; sort-ordered tables
    * should use [[zcluster]] instead, which IS a compaction with
    * layout. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetRowsPerFile: Long): Long = {
    val df = spark.read.parquet(inDir)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    df.repartition(nFiles).write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Tombstone column name understood by [[mergeUpsert]]. */
  val DELETED_COL = "_deleted"

  /** MERGE INTO for plain parquet — the SCD1 upsert maintenance pass
    * (Delta/Iceberg `MERGE` semantics without a table format): rows of
    * `updates` replace base rows with the same key, unmatched update
    * rows insert, and updates carrying `_deleted = true` drop the key.
    * Writes the merged state to a NEW directory (never in place — the
    * [[compact]] contract); the caller's atomic-rename/metastore swap
    * publishes it.
    *
    * Scale shape: ONE keyed anti-join (base minus touched keys) + a
    * union with the surviving updates — the base table streams through
    * a single shuffle-free-on-the-update-side pass when the touched-key
    * set broadcasts (updates are a batch, the base is the 100-TB
    * side; AQE picks the broadcast automatically for batch-sized
    * updates). Update batches must be key-unique — last-writer-wins
    * inside one batch is a caller decision, not something a
    * distributed merge can order. */
  def mergeUpsert(spark: org.apache.spark.sql.SparkSession, baseDir: String,
      updates: DataFrame, keyCol: String, outDir: String): Unit = {
    // key-uniqueness is a hard contract, not a doc note: a duplicate
    // key would survive the union TWICE and corrupt the published
    // table version silently. One batch-sized agg catches it first.
    val dup = updates.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"mergeUpsert: update batch has duplicate key $keyCol=${
        if (dup.isEmpty) "" else dup.head.get(0)} — batches must be key-unique")
    val base = spark.read.parquet(baseDir)
    val survivors = base.join(
      updates.select(col(keyCol)), Seq(keyCol), "left_anti")
    val applied =
      if (updates.columns.contains(DELETED_COL))
        updates.filter(!coalesce(col(DELETED_COL), lit(false)))
          .drop(DELETED_COL)
      else updates
    survivors.unionByName(applied).write.mode("overwrite").parquet(outDir)
  }
}
