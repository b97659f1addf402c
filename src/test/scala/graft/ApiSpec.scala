package graft

import org.apache.spark.sql.functions._

import graft.api.{App, GTable, GlobalTable, SetTable}
import graft.core.{Codec, TopicSpec, TumblingWindow}

/** The faust-surface API: word-count vertical slice (SURVEY §7.3) and
  * the App/Topic/Table wrappers.
  */
class ApiSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val app = new App(spark, "test-app")

  test("word_count vertical slice: stream → flatMap → group_by → table") {
    // examples/word_count.py:16-40 over the documents corpus
    val texts = Tables.documents(spark, sf).select($"text").as[String]
    val words = app.stream(texts).flatMap(_.split(" "))
    val counts = GTable.agg(words, Seq(col("value").as("word")),
      Seq(count(lit(1)).as("n")))
    val got = counts.as[(String, Long)].collect().toMap
    // oracle: plain scala fold over the same rows
    val expected = texts.collect().iterator.flatMap(_.split(" "))
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1) }
    assert(got == expected)
    // point lookup (the table[k] serving path)
    val k = expected.keys.head
    assert(GTable.lookup(counts, "word", k).head.getLong(1) == expected(k))
  }

  test("GTable.fold: arbitrary non-algebraic fold in event order") {
    val events = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "x"), (1L, 15L, "c"))
      .toDF("key", "ts", "v").as[(Long, Long, String)]
    val folded = GTable.fold(app.stream(events))(_._1, _._2)("")(
      (acc, e) => acc + e._3)
    val got = folded.collect().toMap
    assert(got == Map(1L -> "acb", 2L -> "x")) // ordered by ts within key
  }

  test("GTable.foldSorted: spill-safe secondary sort agrees with fold") {
    val events = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "x"), (1L, 15L, "c"))
      .toDF("key", "ts", "v").as[(Long, Long, String)]
    val got = GTable.foldSorted(app.stream(events))(_._1, _._2)("")(
      (acc, e) => acc + e._3).collect().toMap
    assert(got == Map(1L -> "acb", 2L -> "x"))
    // larger cross-check on real data: concat-ordered event types per user
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"event_type")
      .as[(Long, Long, String)].map(e => (e._1, e._2, e._3))
    val a = GTable.fold(app.stream(ev))(_._1, _._2)(0L)((n, _) => n + 1)
      .collect().toMap
    val b = GTable.foldSorted(app.stream(ev))(_._1, _._2)(0L)((n, _) => n + 1)
      .collect().toMap
    assert(a == b)
  }

  test("GTable.windowed: tumbling window wrapper matches manual window()") {
    val ev = Tables.events(spark, sf)
      .withColumn("ts_ms", timestamp_seconds(col("ts_sec")))
    val viaWrapper = GTable.windowed(app.streamDF(ev), TumblingWindow(3600 * 1000),
      col("ts_ms"), Seq(col("event_type")), Seq(count(lit(1)).as("n")))
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
    val manual = ev.groupBy(window($"ts_ms", "3600 seconds"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("w"), $"event_type", $"n")
    assert(viaWrapper.except(manual).isEmpty && manual.except(viaWrapper).isEmpty)
  }

  test("SetTable.materialize honors add/discard delta order") {
    val deltas = Seq(
      ("room1", "alice", SetTable.OpAdd, 1L),
      ("room1", "bob", SetTable.OpAdd, 2L),
      ("room1", "alice", SetTable.OpDiscard, 3L),
      ("room2", "carol", SetTable.OpAdd, 1L))
      .toDF("k", "member", "op", "seq")
    val m = SetTable.materialize(deltas, "k", "member", "op", "seq")
      .select($"k", $"members").as[(String, Seq[String])].collect().toMap
    assert(m == Map("room1" -> Seq("bob"), "room2" -> Seq("carol")))
  }

  test("GlobalTable.join broadcasts the small side") {
    val li = Tables.lineitem(spark, sf)
      .withColumnRenamed("l_partkey", "p_partkey")
    val joined = GlobalTable.join(app.streamDF(li),
      Tables.part(spark, sf), Seq("p_partkey"), "inner")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(joined.count() > 0)
  }

  test("GlobalTable.join row guard trips on a snapshot too big to replicate") {
    val li = Tables.lineitem(spark, sf)
      .withColumnRenamed("l_partkey", "p_partkey")
    val err = intercept[IllegalArgumentException] {
      GlobalTable.join(app.streamDF(li), Tables.part(spark, sf),
        Seq("p_partkey"), "inner", maxRows = 2L)
    }
    assert(err.getMessage.contains("shuffle") && err.getMessage.contains("Layout"),
      s"guard message must point to the scale path: ${err.getMessage}")
  }

  test("AskReply: scatter correlates replies, gather barriers by id") {
    import graft.api.AskReply
    val reqs = Seq(
      AskReply.Request("c1", "reply-topic", 10),
      AskReply.Request("c2", "reply-topic", 20),
      AskReply.Request("c3", "reply-topic", 30)).toDS()
    val replies = AskReply.ask(reqs, (x: Int) => x * 2)
    assert(replies.collect().map(r => r.correlationId -> r.payload).toMap ==
      Map("c1" -> 20, "c2" -> 40, "c3" -> 60))
    val gathered = AskReply.gather(reqs, replies).collect().toMap
    assert(gathered == Map(10 -> 20, 20 -> 40, 30 -> 60))
  }

  test("AskReplyWire: two-topic correlation-id round trip over MemoryStream") {
    import graft.api.AskReplyWire
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // agent inbox rows: (key, value, headers) — both wire modes plus
    // a bare cast (no reply address at all)
    val input = MemoryStream[(String, String, Map[String, Array[Byte]])]
    val inbox = input.toDS().toDF("key", "value", "headers")
    val served = AskReplyWire.serve(inbox, payload => upper(payload))
    val q = served.writeStream.format("memory").queryName("reply_wire")
      .outputMode("append").start()
    try {
      val env1 = Seq(("k1", "ping")).toDF("k", "v")
        .select(AskReplyWire.createReq($"v", lit("agent-reply"), lit("c-1")))
        .as[String].head()
      // envelope JSON carries the faust ns marker on the wire
      assert(env1.contains("\"__faust\":{\"ns\":\"@ReqRepRequest\"}") &&
        env1.contains("\"reply_to\":\"agent-reply\""), env1)
      val hdrs = Seq(1).toDF("x")
        .select(AskReplyWire.createReqHeaders(lit("other-reply"), lit("c-2")))
        .as[Map[String, Array[Byte]]].head()
      assert(hdrs.keySet == Set("Faust-Ag-ReplyTo", "Faust-Ag-CorrelationId"))
      input.addData(
        ("k1", env1, null),                 // envelope mode
        ("k2", "pong", hdrs),               // use_reply_headers mode
        ("k3", "fire-and-forget", null))    // cast: no reply expected
      q.processAllAvailable()
      val replies = spark.table("reply_wire")
      val decoded = replies
        .select($"topic", AskReplyWire.decodeReply($"value").as("r"))
        .select($"topic", $"r.key", $"r.value", $"r.correlation_id",
          $"r.__faust.ns")
        .as[(String, String, String, String, String)].collect().toSet
      // ReqRepResponse rows routed to each request's reply topic;
      // the cast produced nothing
      assert(decoded == Set(
        ("agent-reply", "k1", "PING", "c-1", "@ReqRepResponse"),
        ("other-reply", "k2", "PONG", "c-2", "@ReqRepResponse")), decoded.toString)
      // barrier: finalized at total 2, both fulfilled → done
      val barrier = AskReplyWire.barrierState(replies, Seq("c-1", "c-2"))
        .as[(Long, Long, Boolean)].head()
      assert(barrier == ((2L, 2L, true)))
      // an unfulfilled promise keeps the barrier open
      val open = AskReplyWire.barrierState(replies, Seq("c-1", "c-2", "c-9"))
        .as[(Long, Long, Boolean)].head()
      assert(open == ((2L, 3L, false)))
      // the SAME expression runs as a complete-mode STREAMING agg
      // (dedup + count, not countDistinct — which streaming rejects)
      val bq = AskReplyWire.barrierState(served, Seq("c-1", "c-2"))
        .writeStream.format("memory").queryName("barrier_stream")
        .outputMode("complete").start()
      try {
        bq.processAllAvailable()
        val sb = spark.table("barrier_stream")
          .as[(Long, Long, Boolean)].head()
        assert(sb == ((2L, 2L, true)), sb.toString)
      } finally bq.stop()
    } finally q.stop()
  }

  test("TopicSpec: source options, configs, changelog derivation") {
    val t = TopicSpec(name = Some("orders"), partitions = Some(8),
      retentionMs = Some(86400000L), compacting = true)
    assert(t.sourceOptions == Map("subscribe" -> "orders"))
    assert(t.topicConfigs == Map("retention.ms" -> "86400000", "cleanup.policy" -> "compact"))
    val cl = t.changelogSpec("app1", "mytable")
    assert(cl.name.contains("app1-mytable-changelog") && cl.compacting && cl.internal)
    val p = TopicSpec(pattern = Some("orders-.*"))
    assert(p.sourceOptions == Map("subscribePattern" -> "orders-.*"))
    intercept[IllegalArgumentException](TopicSpec())
  }

  test("GStream: through repartitions, union combines, take limits") {
    val ev = Tables.events(spark, sf)
    val s = app.streamDF(ev)
    assert(s.through(8).ds.rdd.getNumPartitions == 8)
    assert(s.union(s).ds.count() == 2 * ev.count())
    assert(s.take(10).ds.count() == 10)
    val (trigger, opts) = s.takeWithin(5000, java.time.Duration.ofSeconds(30))
    assert(trigger == org.apache.spark.sql.streaming.Trigger.ProcessingTime(30000L))
    assert(opts("maxOffsetsPerTrigger") == "5000")
  }
}
