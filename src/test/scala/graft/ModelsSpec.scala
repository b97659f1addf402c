package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.Models
import graft.core.Codec
import graft.streaming.WindowDeltaStore
import graft.streaming.WindowDeltaStore.{DeltaView, WindowUpdate}

/** Typed models (faust Record analog): schema derivation + JSON wire
  * round-trip (FIXTURES §2 Withdrawal shape), and the delta(d)
  * window-lookback state processor.
  */
case class Withdrawal(user: String, country: String, amount: Double,
                      date: Timestamp)

class ModelsSpec extends SparkTestBase {

  import spark.implicits._

  test("schema derivation matches SURVEY §1.2 type mapping") {
    val s = Models.schemaOf[Withdrawal]
    assert(s.fieldNames.toSeq == Seq("user", "country", "amount", "date"))
    assert(s("amount").dataType.typeName == "double")
    assert(s("date").dataType.typeName == "timestamp")
  }

  test("JSON wire round-trip: dumps then loads preserves the model") {
    val in = Seq(
      Withdrawal("u1", "US", 100.5, Timestamp.valueOf("2024-01-01 10:00:00")),
      Withdrawal("u2", "DE", 7.25, Timestamp.valueOf("2024-02-03 04:05:06"))).toDS()
    val wire = Models.toWire(in, col("user"))
    assert(wire.columns.toSeq == Seq("key", "value"))
    val back = Models.fromWire[Withdrawal](wire).collect().toSet
    assert(back == in.collect().toSet)
  }

  test("fromWire drops undecodable rows instead of failing the query") {
    val wire = Seq(("k1", """{"user":"u1","country":"US","amount":1.0,"date":"2024-01-01T00:00:00"}"""),
      ("k2", "not json at all")).toDF("key", "value")
    val out = Models.fromWire[Withdrawal](wire).collect()
    assert(out.length == 1 && out.head.user == "u1")
  }

  test("decode flattens a JSON value column per codec (Schema.loads_value)") {
    val df = Seq(("a", """{"user":"u9","country":"FR","amount":3.5,"date":"2024-05-05T00:00:00"}"""))
      .toDF("key", "payload")
    val out = Models.decode[Withdrawal](df, "payload", Codec.Json)
    assert(out.columns.toSet == Set("key", "user", "country", "amount", "date"))
    assert(out.select("user").as[String].head() == "u9")
  }

  test("WindowDeltaStore emits current value plus delta(d) lookback") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[WindowUpdate[String, Double]]
    val out = WindowDeltaStore.deltaView(input.toDS(),
      windowSizeMs = 1000, deltaWindows = 1)
    val q = out.writeStream.format("memory").queryName("delta_out")
      .outputMode("append").start()
    try {
      input.addData(WindowUpdate("k", 0L, 10.0), WindowUpdate("k", 1000L, 25.0))
      q.processAllAvailable()
      input.addData(WindowUpdate("k", 2000L, 40.0), WindowUpdate("z", 2000L, 1.0))
      q.processAllAvailable()
      val rows = spark.table("delta_out").as[DeltaView[String, Double]]
        .collect().map(d => (d.key, d.windowStart) -> d.delta).toMap
      assert(rows(("k", 0L)).isEmpty)          // no history yet
      assert(rows(("k", 1000L)).contains(10.0)) // one window back
      assert(rows(("k", 2000L)).contains(25.0)) // across batches
      assert(rows(("z", 2000L)).isEmpty)        // per-key isolation
    } finally q.stop()
  }
}
