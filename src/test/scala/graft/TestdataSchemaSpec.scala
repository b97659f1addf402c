package graft

import org.apache.spark.sql.types._

/** Testdata schema-drift canary.
  *
  * Round 9 was lost because the driver regenerated `events.parquet` with
  * `ts: timestamp[us]` where it had been INT64 nanos, and 33 oracle queries
  * silently vanished from CORRECTNESS with an AnalysisException. This suite
  * pins the dtypes we depend on for all nine tables at sf0.001 so the next
  * drift fails ONE named assertion instead.
  *
  * `events.ts` is asserted against the *set* of forms [[Tables.events]]
  * knows how to dispatch; every other column is asserted exactly as read
  * by the current Spark loaders (timestamp[us] parquet → TIMESTAMP_NTZ).
  */
class TestdataSchemaSpec extends SparkTestBase {

  private def dtypes(name: String): Map[String, DataType] =
    Tables.load(spark, sf, name).schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertCols(table: String, expected: (String, DataType)*): Unit = {
    val actual = dtypes(table)
    expected.foreach { case (col, dt) =>
      assert(actual.contains(col),
        s"testdata drift: $table.$col is MISSING (have: ${actual.keys.toSeq.sorted.mkString(", ")})")
      assert(actual(col) == dt,
        s"testdata drift: $table.$col is ${actual(col)}, expected $dt — update loaders/oracles")
    }
  }

  test("events: ts is a form Tables.events dispatches on; rest exact") {
    val actual = dtypes("events")
    val tsOk = Set[DataType](LongType, TimestampType, TimestampNTZType)
    assert(actual.contains("ts"), "testdata drift: events.ts is MISSING")
    assert(tsOk.contains(actual("ts")),
      s"testdata drift: events.ts is ${actual("ts")} — extend Tables.events schema dispatch")
    assertCols("events",
      "event_id" -> LongType, "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType)
    // And the contract every event-time query builds on:
    assert(Tables.events(spark, sf).schema("ts_sec").dataType == LongType,
      "Tables.events contract broken: ts_sec must be LONG epoch seconds")
  }

  test("lineitem dtypes") {
    assertCols("lineitem",
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
  }

  test("orders dtypes") {
    assertCols("orders",
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType)
  }

  test("customer / supplier / part dtypes") {
    assertCols("customer",
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("supplier",
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType)
    assertCols("part",
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
  }

  test("nation and region dtypes") {
    assertCols("nation",
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)
    assertCols("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
  }

  test("documents dtypes") {
    assertCols("documents",
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }

  test("embeddings dtypes") {
    assertCols("embeddings",
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  }
}
