package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, SquaredDistance}

/**
 * Session extension registering the native vector kernels as SQL
 * functions, so `spark.sql("... vec_dot(a, b) ...")` works anywhere
 * the DataFrame helpers ([[graft.functions.ArrayExprs]]) do — the
 * standard `SparkSessionExtensions` integration point
 * (`spark.sql.extensions=graft.GraftExtensions`), injected without
 * touching any session internals.
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
  }
}
