package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** S1/S2 fold-file ingest (reference Main.scala:33-59) against the
  * checked-in fixtures. */
class IngestSpec extends SparkSuite {

  test("ratingsTsv reads headerless TSV with explicit schema and real timestamps") {
    val df = Tables.ratingsTsv(spark, resourcePath("ratings_fixture.tsv"))
    assert(df.count() == 20)
    assert(df.schema("user_id").dataType == IntegerType)
    assert(df.schema("rating").dataType == DoubleType)
    assert(df.schema("ts").dataType == TimestampType)
    val first = df.orderBy("ts").head
    assert(first.getTimestamp(3).toInstant.getEpochSecond == 874700000L)
    assert(df.where("rating < 1.0 OR rating > 5.0").count() == 0)
  }

  test("featuresCsv reads headered CSV with inferred integer flags") {
    val df = Tables.featuresCsv(spark, resourcePath("features_fixture.csv"))
    assert(df.count() == 8)
    assert(df.columns.toSeq == Seq("id", "X1", "X2", "X3", "X4", "X5"))
    assert(df.schema.fields.forall(_.dataType == IntegerType))
  }

  test("R6 feature assembly: VectorAssembler over all non-id columns") {
    // the reference's content-feature build (ContentRecommender
    // .scala:36-53) — assemble genre flags, then the array<double>
    // form the content scorer consumes
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.functions.vector_to_array
    import org.apache.spark.sql.functions.col
    val df = Tables.featuresCsv(spark, resourcePath("features_fixture.csv"))
    val assembled = new VectorAssembler()
      .setInputCols(df.columns.filter(_ != "id"))
      .setOutputCol("features")
      .transform(df)
      .select(col("id"), vector_to_array(col("features")).as("fv"))
    val row = assembled.orderBy("id").head // T5 first-row fetch
    assert(row.getSeq[Double](1).length == 5)
    assert(assembled.count() == 8)
    // assembled vectors plug straight into the content scorer
    assert(assembled.schema("fv").dataType.typeName == "array")
  }
}
