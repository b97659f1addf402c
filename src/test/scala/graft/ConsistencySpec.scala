package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.Models
import graft.streaming.StatefulTable

case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double)

/** The reference's consistency oracle
  * (`t/consistency/consistency_checker.py:18-100`): rebuild the
  * expected table by folding the source linearly; assert the engine's
  * stateful table agrees — here under arbitrary micro-batch splits
  * (the analog of worker kills/restarts between offsets).
  */
class ConsistencySpec extends SparkTestBase {

  import spark.implicits._

  private def foldExpected(rows: Seq[(Long, Double)]): Map[Long, Double] =
    rows.foldLeft(Map.empty[Long, Double]) { case (m, (u, v)) =>
      m.updated(u, m.getOrElse(u, 0.0) + v)
    }

  test("stateful fold equals linear source fold under random batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"value").as[(Long, Double)].collect().toSeq
    val expected = foldExpected(rows)

    val rnd = new scala.util.Random(7)
    val input = MemoryStream[(Long, Double)]
    val folded = StatefulTable.runningFold(
      input.toDS(), (r: (Long, Double)) => r._1)(0.0)((acc, r) => acc + r._2)()
    val q = folded.writeStream.format("memory").queryName("consistency_out")
      .outputMode("update").start()
    try {
      // feed in randomly-sized batches (1..97 events), like a worker
      // consuming variable fetch sizes between commits
      var rest = rows
      while (rest.nonEmpty) {
        val n = 1 + rnd.nextInt(97)
        val (batch, tail) = rest.splitAt(n)
        input.addData(batch)
        if (rnd.nextBoolean()) q.processAllAvailable()
        rest = tail
      }
      q.processAllAvailable()
      val got = spark.table("consistency_out").as[(Long, Double)].collect()
        .groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - expected(k)) < 1e-9, s"key $k: $v vs ${expected(k)}")
      }
    } finally q.stop()
  }

  test("produce frame: headers + explicit-partition routing contract") {
    // faust Topic.send(key, value, partition, headers) — topics.py:155-195.
    // No broker in the sandbox: assert the exact frame shape the Kafka
    // sink consumes (key/value binary, headers array<struct<key:string,
    // value:binary>>, partition int) and the routing/header values.
    val src = Tables.events(spark, sf).limit(100)
    val frame = graft.api.Topic.produceFrame(src,
      key = $"user_id".cast("string"),
      value = to_json(struct($"event_id", $"value")),
      partition = Some(pmod($"user_id", lit(8))),
      headers = Seq(
        "event_type" -> $"event_type",
        "source" -> lit("graft")))

    // wire shape
    val sch = frame.schema
    assert(sch.fieldNames.toSeq == Seq("key", "value", "headers", "partition"))
    assert(sch("key").dataType.typeName == "binary")
    assert(sch("value").dataType.typeName == "binary")
    assert(sch("partition").dataType.typeName == "integer")
    assert(sch("headers").dataType.sql.replace(" NOT NULL", "") ==
      "ARRAY<STRUCT<key: STRING, value: BINARY>>", sch("headers").dataType.sql)

    // explicit partition wins and is key-stable: every record of one
    // key lands on one partition (co-partitioning contract tables need)
    val parts = frame.select($"key".cast("string"), $"partition")
      .groupBy("key").agg(countDistinct("partition").as("k"))
    assert(parts.where($"k" =!= 1).count() == 0)
    assert(frame.select(max("partition")).head().getInt(0) <= 7)

    // headers round-trip: read side decodes the same values
    val h = frame.select($"key".cast("string").as("key"),
        explode($"headers").as("h"))
      .select($"key", $"h.key".as("hk"), $"h.value".cast("string").as("hv"))
    assert(h.where($"hk" === "source" && $"hv" =!= "graft").count() == 0)
    val typed = h.where($"hk" === "event_type").select("hv").distinct()
      .as[String].collect().toSet
    val expectTypes = src.select("event_type").distinct().as[String].collect().toSet
    assert(typed == expectTypes)

    // without explicit partition/headers the frame is minimal (sink's
    // default partitioner routes by key, like faust's producer default)
    val minimal = graft.api.Topic.produceFrame(src, $"user_id".cast("string"),
      to_json(struct($"event_id")))
    assert(minimal.schema.fieldNames.toSeq == Seq("key", "value"))
  }

  test("produce frame edge cases: null key, tombstone, per-record topic") {
    // faust send(key=None, value=None) is legal (topics.py:155-170):
    // null key → default partitioner; null value → tombstone record
    // (the deletion marker log-compacted changelog topics require).
    val src = Tables.events(spark, sf).limit(100)
    val frame = graft.api.Topic.produceFrame(src,
      key = when($"user_id" % 2 === 0, $"user_id".cast("string")),
      value = when($"event_type" =!= "purchase",
        to_json(struct($"event_id", $"value"))))
    val nullKeys = frame.where($"key".isNull).count()
    val evenKeys = src.where($"user_id" % 2 =!= 0).count()
    assert(nullKeys == evenKeys, "null keys must survive the binary cast")
    val tombstones = frame.where($"value".isNull).count()
    assert(tombstones == src.where($"event_type" === "purchase").count() &&
      tombstones > 0, "null values (tombstones) must survive")

    // per-record topic routing (faust derive_topic / forward): the
    // sink's `topic` column, one value per record, string-typed
    val routed = graft.api.Topic.produceFrame(src,
      key = $"user_id".cast("string"),
      value = to_json(struct($"event_id")),
      topic = Some(concat(lit("events_"), $"event_type")))
    assert(routed.schema.fieldNames.toSeq == Seq("key", "value", "topic"))
    assert(routed.schema("topic").dataType.typeName == "string")
    val topics = routed.select("topic").distinct().as[String].collect().toSet
    val expect = src.select(concat(lit("events_"), $"event_type"))
      .distinct().as[String].collect().toSet
    assert(topics == expect)

    // a null HEADER value is a legal Kafka record header; the struct
    // keeps the key and nulls only the value
    val hdrFrame = graft.api.Topic.produceFrame(src,
      key = $"user_id".cast("string"),
      value = to_json(struct($"event_id")),
      headers = Seq("trace" -> when($"user_id" % 5 === 0, $"event_type")))
    val hdr = hdrFrame.select(explode($"headers").as("h"))
      .select($"h.key".as("hk"), $"h.value".as("hv"))
    assert(hdr.where($"hk".isNull).count() == 0)
    assert(hdr.where($"hv".isNull).count() ==
      src.where($"user_id" % 5 =!= 0).count())

    // already-binary payloads pass through byte-identical (the
    // serializer step is the caller's when the codec isn't utf8/json)
    val raw = graft.api.Topic.produceFrame(src,
      key = $"user_id".cast("string"),
      value = $"event_type".cast("binary"))
    val back = raw.select($"value".cast("string")).distinct()
      .as[String].collect().toSet
    assert(back == src.select("event_type").distinct().as[String].collect().toSet)
  }

  test("kafka-frame pipeline: raw frame → model decode → agent transform → table") {
    // Simulate the Kafka source frame (§3.1 consume path) from events:
    // key/value binary + topic/partition/offset/timestamp metadata.
    val frame = Tables.events(spark, sf)
      .select(
        $"user_id".cast("string").cast("binary").as("key"),
        to_json(struct($"event_id", $"user_id", $"event_type", $"value")).cast("binary").as("value"),
        lit("events").as("topic"),
        pmod($"user_id", lit(8)).cast("int").as("partition"),
        $"event_id".as("offset"),
        timestamp_seconds($"ts_sec").as("timestamp"))

    val decoded = Models.fromWire[Ev](frame.withColumn("value", $"value".cast("string")))
    val table = decoded.groupByKey(_.user_id)
      .agg(count("*").as[Long]).collect().toMap
    val expected = Tables.events(spark, sf).groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(table == expected)
  }
}
