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

case class PointM(x: Long, y: Long)
case class AccountM(id: String, active: Boolean)

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

  test("YamlFlat codec round-trips flat models (codecs.py:264 subset)") {
    val in = Seq(Withdrawal("u1", "US", 100.5, Timestamp.valueOf("2024-01-01 10:00:00")),
      Withdrawal("u2", "DE", 7.25, Timestamp.valueOf("2024-02-03 04:05:06"))).toDS()
    val encoded = Models.encode(in.toDF(), Codec.YamlFlat,
      col("user"), col("country"), col("amount"), col("date"))
    val wire = encoded.select(col("user").as("key"), col("value")).as[(String, String)]
    val y = wire.collect().toMap.apply("u1")
    assert(y == "user: u1\ncountry: US\namount: 100.5\ndate: 2024-01-01 10:00:00",
      y)
    val back = Models.decode[Withdrawal](
      wire.toDF("key", "payload"), "payload", Codec.YamlFlat)
    assert(back.columns.toSet == Set("key", "user", "country", "amount", "date"))
    val got = back.select("user", "country", "amount", "date")
      .as[Withdrawal].collect().toSet
    assert(got == in.collect().toSet)
    // missing fields decode as null, not an error
    val sparse = Seq(("k", "user: u3\namount: 1.0")).toDF("key", "payload")
    val row = Models.decode[Withdrawal](sparse, "payload", Codec.YamlFlat)
    assert(row.select("user").as[String].head() == "u3")
    assert(row.where(col("country").isNull && col("date").isNull).count() == 1)
  }

  test("Base64 codec round-trips arbitrary bytes (codecs.py:293 binary)") {
    val blobs = Seq(
      ("a", Array[Byte](0, 1, -1, 127, -128, 64)),
      ("b", Array.empty[Byte]),
      ("c", Array.tabulate(300)(i => (i % 256 - 128).toByte))) // > 76-char b64
    val df = blobs.toDF("k", "raw")
    val enc = Models.encode(df, Codec.Base64, col("raw"))
    // canonical unchunked text (no CR/LF even past the MIME wrap point)
    assert(enc.where(col("value").rlike("[\\r\\n]")).count() == 0)
    val dec = Models.decode[String](enc, "value", Codec.Base64)
    val got = dec.select(col("k"), col("value_bytes"))
      .as[(String, Array[Byte])].collect().toMap
    blobs.foreach { case (k, raw) =>
      assert(java.util.Arrays.equals(got(k), raw), s"roundtrip failed for $k")
    }
  }

  test("polymorphic decode dispatches on the blessed __faust.ns key") {
    // faust embeds {"__faust":{"ns":...}} and loads() dispatches on it
    // (models/base.py:225-300); unknown ns → no variant decodes
    val pts = Models.toWirePolymorphic(
      Seq(PointM(1, 2), PointM(3, 4)).toDS(), "t.PointM", col("x"))
    val accts = Models.toWirePolymorphic(
      Seq(AccountM("a9", true)).toDS(), "t.AccountM", col("id"))
    val unknown = Seq(("z", """{"__faust":{"ns":"t.Ghost"},"q":1}""")).toDF("key", "value")
    val wire = pts.union(accts).union(unknown)
    val out = Models.decodePolymorphic(wire, "value", Map(
      "t.PointM" -> Models.schemaOf[PointM],
      "t.AccountM" -> Models.schemaOf[AccountM]))
    assert(out.where(col("ns") === "t.PointM")
      .select(col("PointM.x"), col("PointM.y"))
      .as[(Long, Long)].collect().toSet == Set((1L, 2L), (3L, 4L)))
    val acct = out.where(col("ns") === "t.AccountM")
      .select(col("AccountM.id"), col("AccountM.active")).as[(String, Boolean)].head()
    assert(acct == ("a9", true))
    // unknown ns: carried through, every variant column null
    val ghost = out.where(col("ns") === "t.Ghost")
    assert(ghost.count() == 1)
    assert(ghost.where(col("PointM").isNull && col("AccountM").isNull).count() == 1)
    // round-trip: the blessed key itself is not a model field
    assert(!out.columns.contains("__faust"))
  }

  test("input_name/output_name remapping round-trips (fields.py:86-94)") {
    val in = Seq(Withdrawal("u1", "US", 9.5, Timestamp.valueOf("2024-03-04 05:06:07"))).toDS()
    // dump with wire names, read back mapping attr -> wire key
    val remap = Map("user" -> "userName", "amount" -> "amt")
    val wire = Models.toWireRenamed(in, col("user"), remap)
    val payload = wire.select("value").as[String].head()
    assert(payload.contains("\"userName\"") && payload.contains("\"amt\"")
      && !payload.contains("\"user\":") && !payload.contains("\"amount\""))
    val back = Models.fromWireRenamed[Withdrawal](wire, remap).collect().toSeq
    assert(back == in.collect().toSeq)
    // a payload WITHOUT the wire name does not populate the attribute
    val plain = Seq(("k", """{"user":"u1","country":"US","amount":1.0,"date":"2024-01-01T00:00:00"}"""))
      .toDF("key", "value")
    assert(Models.fromWireRenamed[Withdrawal](plain, remap)
      .where(col("user").isNotNull).count() == 0)
  }

  test("field validation quarantines invalid rows (fields.py:214-233)") {
    val df = Seq(
      ("a", 12.34, "US"),   // valid
      ("b", 123456.7, "DE"),// violates max_digits=4
      ("c", 1.23456, "FR"), // violates max_places=2
      (null, 1.0, "GB"),    // violates required id
      ("e", 5.0, "xx")      // violates country regex
    ).toDF("id", "amount", "country")
    val checks = Seq(
      Models.notNull("id"),
      Models.decimalBounds("amount", maxDigits = 4, maxPlaces = 2),
      Models.matches("country", "^[A-Z]{2}$"))
    val flagged = Models.withValidation(df, checks)
    assert(flagged.where(size(col("_errors")) === 0).select("id").as[String]
      .collect().toSet == Set("a"))
    assert(Models.validOnly(df, checks).count() == 1)
    val errsByRow = Models.invalidRows(df, checks)
      .select(col("country"), col("_errors")).as[(String, Seq[String])]
      .collect().toMap
    assert(errsByRow("DE").exists(_.contains("max_digits")))
    assert(errsByRow("FR").exists(_.contains("max_digits"))) // places check shares the message
    assert(errsByRow("GB").exists(_.contains("required")))
    assert(errsByRow("xx").exists(_.contains("does not match")))
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
