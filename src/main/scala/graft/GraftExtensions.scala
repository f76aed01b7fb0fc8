package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import graft.functions.{DotProduct, SquaredDistance}

/**
 * Session extension registering the native vector kernels as SQL
 * functions, so `spark.sql("... vec_dot(a, b) ...")` works anywhere
 * the DataFrame helpers ([[graft.functions.ArrayExprs]]) do — the
 * standard `SparkSessionExtensions` integration point
 * (`spark.sql.extensions=graft.GraftExtensions`), injected without
 * touching any session internals.
 *
 * Also surfaces Catalyst's INTERNAL Bloom-filter pair (the expressions
 * behind AQE runtime filter injection, which the public registry
 * doesn't expose) as `bloom_agg` / `bloom_contains` — the build-once
 * probe-everywhere sketch that [[graft.operators.Skew.bloomPrune]]
 * uses for semi-join reduction.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "vec_sqdist"),
      (children: Seq[Expression]) => SquaredDistance(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, n) => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "bloom_agg(col[, expectedItems[, numBits]])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "bloom_contains"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children(0), children(1))))
  }
}
