package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("as-of join picks the latest right row at or before each left ts") {
    val left = Seq((1L, 100L, 1000L), (1L, 200L, 1001L), (2L, 50L, 1002L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 90L, 1L), (1L, 100L, 2L), (1L, 150L, 3L), (2L, 60L, 4L))
      .toDF("k", "ts", "rid")
    val out = AsOfJoin.join(left, right, "k", "ts", "lid", "rid")
      .select($"lid", $"asof_id", $"asof_ts").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1000L) == (Some(2L), Some(100L)))  // ts=100 matches rid=2 at ts=100 (<=)
    assert(out(1001L) == (Some(3L), Some(150L)))  // latest before 200
    assert(out(1002L) == (None, None))            // right at 60 > 50: no match
  }

  test("joinForward picks the nearest right row at or after each left ts") {
    val left = Seq((1L, 100L, 1000L), (1L, 200L, 1001L), (2L, 50L, 1002L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 100L, 1L), (1L, 150L, 2L), (1L, 400L, 3L), (2L, 40L, 4L))
      .toDF("k", "ts", "rid")
    val out = AsOfJoin.joinForward(left, right, "k", "ts", "lid", "rid")
      .select($"lid", $"asof_id", $"asof_ts").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1000L) == (Some(1L), Some(100L)))  // ts=100: match at exactly 100
    assert(out(1001L) == (Some(3L), Some(400L)))  // nearest future
    assert(out(1002L) == (None, None))            // right only in the past
  }

  test("withTolerance nulls matches whose gap exceeds the bound") {
    val left = Seq((1L, 100L, 1000L), (1L, 200L, 1001L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 95L, 1L), (1L, 120L, 2L)).toDF("k", "ts", "rid")
    val j = AsOfJoin.join(left, right, "k", "ts", "lid", "rid")
    val out = AsOfJoin.withTolerance(j, "ts", 10)
      .select($"lid", $"asof_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1000L) == Some(1L))  // gap 5 <= 10
    assert(out(1001L) == None)      // gap 80 > 10 → nulled, row kept
  }

  test("as-of join carries payload columns from the matched right row") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 40L, 1L, "old"), (1L, 90L, 2L, "new"))
      .toDF("k", "ts", "rid", "tag")
    val out = AsOfJoin.join(left, right, "k", "ts", "lid", "rid", payload = Seq("tag"))
    val row = out.select($"asof_id", $"asof_tag").head()
    assert(row.getLong(0) == 2L && row.getString(1) == "new")
  }

  test("null payload on the matched row stays null (no stale fallback)") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 40L, 1L, "old"), (1L, 90L, 2L, null.asInstanceOf[String]))
      .toDF("k", "ts", "rid", "tag")
    val row = AsOfJoin.join(left, right, "k", "ts", "lid", "rid", payload = Seq("tag"))
      .select($"asof_id", $"asof_tag").head()
    assert(row.getLong(0) == 2L)
    assert(row.isNullAt(1), s"payload must come from the matched row: $row")
  }

  test("joinNative: custom Catalyst operator matches the union-and-carry form") {
    val e = Tables.events(spark, sf)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_sec", $"event_id")
    val clicks = AsOfJoin.dedupRight(
      e.filter($"event_type" === "click")
        .select($"user_id", $"ts_sec", $"event_id"),
      "user_id", "ts_sec", "event_id")
    val native = AsOfJoin.joinNative(purchases,
      clicks.select($"user_id".as("c_user"), $"ts_sec".as("c_ts"),
        $"event_id".as("c_id")),
      "user_id", "ts_sec", "c_user", "c_ts")
      .select($"event_id", $"c_id", $"c_ts")
    val carry = AsOfJoin.join(purchases, clicks,
      "user_id", "ts_sec", "event_id", "event_id")
      .select($"event_id", $"asof_id".as("c_id"), $"asof_ts".as("c_ts"))
    assert(native.count() == purchases.count())
    assert(native.except(carry).isEmpty && carry.except(native).isEmpty)
    // planner shape: the custom exec with one Exchange + Sort per side
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    // exactly one Exchange per side — no extra shuffles
    assert("Exchange hashpartitioning".r.findAllIn(plan)
      .size >= 2, s"expected per-side exchanges:\n$plan")
  }

  test("joinNative: custom operator edge cases (empty right, no match)") {
    val left = Seq((1L, 100L, 1000L), (1L, 200L, 1001L), (2L, 50L, 1002L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 90L, 1L), (1L, 150L, 3L), (2L, 60L, 4L))
      .toDF("rk", "rts", "rid")
    val out = AsOfJoin.joinNative(left, right, "k", "ts", "rk", "rts")
      .select($"lid", $"rid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1000L -> Some(1L), 1001L -> Some(3L), 1002L -> None))
    val empty = AsOfJoin.joinNative(left,
      right.where($"rid" < 0), "k", "ts", "rk", "rts")
    assert(empty.count() == 3 && empty.where($"rid".isNotNull).count() == 0)
  }

  test("PushFilterThroughAsOfJoin: left-only predicates reach the scan") {
    val e = Tables.events(spark, sf)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_sec", $"event_id")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts_sec".as("c_ts"), $"event_id".as("c_id"))
    val joined = AsOfJoin.joinNative(purchases, clicks,
      "user_id", "ts_sec", "c_user", "c_ts")
      .where($"event_id" < 100 && $"c_id".isNotNull)
    val optimized = joined.queryExecution.optimizedPlan.toString
    // the left-only predicate sits BELOW the custom node...
    val nodeIdx = optimized.indexOf("AsOfJoinPlan")
    assert(nodeIdx >= 0)
    assert(optimized.indexOf("(event_id", nodeIdx) >= 0,
      s"left filter not pushed below the as-of node:\n$optimized")
    // ...while the right-column predicate stays above (pushing it
    // would change which row gets carried)
    assert(optimized.indexOf("isnotnull(c_id") < nodeIdx,
      s"right-side filter must stay above:\n$optimized")
    // and the filtered result matches filtering the input directly
    val direct = AsOfJoin.joinNative(purchases.where($"event_id" < 100), clicks,
      "user_id", "ts_sec", "c_user", "c_ts").where($"c_id".isNotNull)
    assert(joined.except(direct).isEmpty && direct.except(joined).isEmpty)
  }

  test("dedupRight keeps the max-id row per (key, ts)") {
    val right = Seq((1L, 100L, 5L), (1L, 100L, 9L), (1L, 200L, 2L))
      .toDF("k", "ts", "rid")
    val out = AsOfJoin.dedupRight(right, "k", "ts", "rid")
      .select($"rid").as[Long].collect().toSet
    assert(out == Set(9L, 2L))
  }

  test("GraftExtensions: custom expressions callable from SQL") {
    new GraftExtensions().registerOn(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vector_dot(a, b) AS d FROM vecs")
      .as[Double].head() == 11.0)
    assert(spark.sql("SELECT simhash64(array('x','y')) AS h").as[Long].head() ==
      spark.sql("SELECT simhash64(array('y','x')) AS h").as[Long].head())
    assert(spark.sql(
      "SELECT minhash_agreement(array(1L,2L,3L), array(1L,9L,3L)) AS n")
      .as[Int].head() == 2)
  }

  test("GraftExtensions: null slots and wrong types handled") {
    new GraftExtensions().registerOn(spark)
    // null-vs-null / null-vs-value never count as agreement
    assert(spark.sql(
      "SELECT minhash_agreement(array(1L,NULL,3L), array(1L,NULL,NULL)) AS n")
      .as[Int].head() == 1)
    // wrong input types fail at analysis, not with a runtime cast error
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_agreement(array('a'), array('b'))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vector_dot(array(1L), array(2L))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(array(1, 2))").collect()
    }
  }
}
