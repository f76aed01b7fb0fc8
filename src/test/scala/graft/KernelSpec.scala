package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns._
import graft.functions.Rounding.r4

/** K1-K4 kernel properties and hand-computed values
  * (reference similarity package semantics). */
class KernelSpec extends SparkSuite {

  private def eval2(a: Seq[Double], b: Seq[Double],
                    f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double = {
    val df = spark.range(1).select(
      typedLit(a).as("a"), typedLit(b).as("b"))
    df.select(r4(f(col("a"), col("b"))).as("v")).head.getDouble(0)
  }

  test("cosine matches hand value") {
    assert(eval2(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), cosineArr) == 0.9746)
  }

  test("cosine is symmetric and 1.0 on identical vectors") {
    val v = Seq(0.5, 2.5, 1.5)
    assert(eval2(v, v, cosineArr) == 1.0)
    assert(eval2(Seq(1.0, 0.0), Seq(0.0, 1.0), cosineArr) == 0.0)
    assert(eval2(Seq(1.0, 2.0), Seq(3.0, 1.0), cosineArr) ==
      eval2(Seq(3.0, 1.0), Seq(1.0, 2.0), cosineArr))
  }

  test("inverse euclidean matches hand value; 1.0 at distance zero") {
    assert(eval2(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), invEuclideanArr) == 0.1614)
    assert(eval2(Seq(2.0, 2.0), Seq(2.0, 2.0), invEuclideanArr) == 1.0)
  }

  test("dot and norms compose") {
    assert(eval2(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0), dotArr) == 32.0)
    val df = spark.range(1).select(typedLit(Seq(3.0, 4.0)).as("a"))
    assert(df.select(l2Norm(col("a")).as("n")).head.getDouble(0) == 5.0)
  }

  test("tokens lowercases, trims and drops empties") {
    val df = spark.range(1).select(lit("  Hello   WORLD  test ").as("t"))
    val got = df.select(tokens(col("t")).as("tk")).head.getSeq[String](0)
    assert(got == Seq("hello", "world", "test"))
  }

  test("shingles n=3 over 5 tokens gives 3 ordered shingles; short docs give none") {
    val df = spark.range(1).select(lit("a b c d e").as("t"))
    val got = df.select(shingles(tokens(col("t")), 3).as("s")).head.getSeq[String](0)
    assert(got == Seq("a b c", "b c d", "c d e"))
    val short = spark.range(1).select(lit("a b").as("t"))
      .select(shingles(tokens(col("t")), 3).as("s")).head.getSeq[String](0)
    assert(short.isEmpty)
  }
}
