package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Ingest contract: the expected shape of every driver-generated table,
  * asserted at sf0.001 through the `Tables.*` readers the whole engine
  * consumes. This is the tripwire for testdata regeneration — when the
  * driver re-writes the parquet with a different physical layout (as
  * happened between rounds 5 and 6, when `events.ts` moved from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)), this suite names the break
  * as ONE precise schema assertion instead of 21 opaque downstream
  * query failures at the correctness gate.
  *
  * Timestamp columns are allowed to surface as either TimestampType or
  * TimestampNTZType from the raw scans (parquet isAdjustedToUTC decides,
  * and every session pins timeZone=UTC so the two are value-identical);
  * `Tables.events` must canonicalize `ts` to TimestampType whichever
  * physical layout is on disk.
  */
class IngestContractSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  /** Either timestamp flavor — value-identical under the UTC session. */
  private val TsFamily: Set[DataType] = Set(TimestampType, TimestampNTZType)

  private def assertSchema(name: String, actual: StructType, expected: Seq[(String, Any)]): Unit = {
    assert(actual.fieldNames.toSeq == expected.map(_._1),
      s"$name column names drifted: got ${actual.fieldNames.toSeq}")
    expected.foreach {
      case (col, dt: DataType) =>
        assert(actual(col).dataType == dt, s"$name.$col: got ${actual(col).dataType}, want $dt")
      case (col, family: Set[_]) =>
        assert(family.asInstanceOf[Set[DataType]].contains(actual(col).dataType),
          s"$name.$col: got ${actual(col).dataType}, want one of $family")
    }
  }

  test("region / nation dimension schemas") {
    assertSchema("region", Tables.region(spark, dir).schema,
      Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", Tables.nation(spark, dir).schema,
      Seq("n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
  }

  test("customer / supplier / part schemas") {
    assertSchema("customer", Tables.customer(spark, dir).schema,
      Seq("c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
        "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assertSchema("supplier", Tables.supplier(spark, dir).schema,
      Seq("s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
        "s_acctbal" -> DoubleType))
    assertSchema("part", Tables.part(spark, dir).schema,
      Seq("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
        "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("orders / lineitem fact schemas (timestamp family dates)") {
    assertSchema("orders", Tables.orders(spark, dir).schema,
      Seq("o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
        "o_totalprice" -> DoubleType, "o_orderdate" -> TsFamily, "o_orderpriority" -> StringType))
    assertSchema("lineitem", Tables.lineitem(spark, dir).schema,
      Seq("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
        "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType, "l_shipdate" -> TsFamily))
  }

  test("events: ts canonicalized to TimestampType whatever the physical layout") {
    val ev = Tables.events(spark, dir)
    assertSchema("events", ev.schema,
      Seq("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
    // And the values are sane timestamps, not a units mix-up: every ts
    // must land between 2000 and 2100 (a nanos-vs-micros confusion is
    // off by 1000x and lands millennia away).
    val bad = ev.where("ts < timestamp'2000-01-01' OR ts > timestamp'2100-01-01'").count()
    assert(bad == 0, s"$bad event timestamps outside [2000, 2100] — unit mix-up in the ts rebuild?")
    assert(ev.count() > 0)
  }

  test("documents / embeddings schemas") {
    assertSchema("documents", Tables.documents(spark, dir).schema,
      Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", Tables.embeddings(spark, dir).schema,
      Seq("vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }

  test("derived ratings view shape") {
    val r = Tables.ratings(spark, dir)
    assert(r.columns.toSeq == Seq("user_id", "item_id", "rating"))
    assert(r.schema("rating").dataType == DoubleType)
  }
}
