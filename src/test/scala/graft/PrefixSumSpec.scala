package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PrefixSum

/** The two-pass distributed prefix sum (round-17, verdict finding 1):
  * bit-for-bit parity with the single-window formulation it replaces,
  * under unordered input, heavy group skew, and degenerate bucketing.
  */
class PrefixSumSpec extends SparkTestBase {
  import spark.implicits._

  // 3 groups with 90/7/3% skew (the shape the m21 fix exists to
  // survive), ids deliberately written out of order
  private lazy val skewed = {
    val rows = (1L to 900L).map(i => ("big", i, i % 7 + 1)) ++
      (1L to 70L).map(i => ("mid", i, i % 5 + 1)) ++
      (1L to 30L).map(i => ("small", i, i % 3 + 1))
    scala.util.Random.shuffle(rows).toDF("g", "id", "v")
      .repartition(4)
  }

  test("groupedRunningSum ≡ the single-window cumulative sum") {
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = skewed.withColumn("cum", sum(col("v")).over(w))
      .select("g", "id", "cum").as[(String, Long, Long)].collect().toSet
    val got = PrefixSum.groupedRunningSum(skewed, Seq("g"),
        order = Seq(col("id")),
        bucket = floor(col("id") / 16).cast("long"),
        value = col("v"), out = "cum")
      .select("g", "id", "cum").as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("groupedRowNumber ≡ row_number under the same total order") {
    val w = Window.partitionBy("g").orderBy("id")
    val expected = skewed.withColumn("rk", row_number().over(w))
      .select("g", "id", "rk").as[(String, Long, Int)].collect()
      .map { case (g, id, rk) => (g, id, rk.toLong) }.toSet
    val got = PrefixSum.groupedRowNumber(skewed, Seq("g"),
        order = Seq(col("id")),
        bucket = floor(col("id") / 16).cast("long"), out = "rk")
      .select("g", "id", "rk").as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("column order is preserved: result is input columns + out") {
    val out = PrefixSum.groupedRunningSum(skewed, Seq("g"),
      Seq(col("id")), floor(col("id") / 16).cast("long"), col("v"), "cum")
    assert(out.columns.toSeq == Seq("g", "id", "v", "cum"))
  }

  test("degenerate single bucket still agrees (bucket = constant)") {
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = skewed.withColumn("cum", sum(col("v")).over(w))
      .select("g", "id", "cum").as[(String, Long, Long)].collect().toSet
    val got = PrefixSum.groupedRunningSum(skewed, Seq("g"),
        Seq(col("id")), lit(0L), col("v"), "cum")
      .select("g", "id", "cum").as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("no raw-grain window keyed on the bare group survives the plan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val out = PrefixSum.groupedRunningSum(skewed, Seq("g"),
      Seq(col("id")), floor(col("id") / 16).cast("long"), col("v"), "cum")
    val rawGroupWindows = out.queryExecution.optimizedPlan.collect {
      case w: LWindow
          if w.partitionSpec.flatMap(_.references.map(_.name)) == Seq("g") &&
            w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(rawGroupWindows.isEmpty,
      "the per-group window must only ever see the aggregated subtotal table")
    // and the heavy window really is keyed on (group, bucket): the big
    // group's rows spread over its buckets rather than one task
    val buckets = skewed.where(col("g") === "big")
      .select(floor(col("id") / 16).cast("long")).distinct().count()
    assert(buckets > 16, s"skew probe expects many buckets, got $buckets")
  }

  test("globalRowNumber ≡ the single-partition global window index") {
    // unique ids (a total global order), deliberately shuffled input
    val df = scala.util.Random.shuffle((1L to 500L).toList)
      .toDF("id").withColumn("v", col("id") % 7)
      .repartition(4)
    val expected = df.withColumn("rk", row_number().over(Window.orderBy("id")))
      .select("id", "rk").as[(Long, Int)].collect()
      .map { case (id, rk) => (id, rk.toLong) }.toSet
    val got = PrefixSum.globalRowNumber(df,
        order = Seq(col("id")),
        bucket = floor(col("id") / 16).cast("long"), out = "rk")
      .select("id", "rk").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("NULL group values form a partition, never silently drop") {
    val df = Seq((Some("a"), 1L, 2L), (None, 2L, 3L), (None, 3L, 4L),
        (Some("a"), 4L, 5L))
      .toDF("g", "id", "v")
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("cum", sum(col("v")).over(w))
      .select("g", "id", "cum")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet
    val got = PrefixSum.groupedRunningSum(df, Seq("g"),
        Seq(col("id")), floor(col("id") / 2).cast("long"), col("v"), "cum")
      .select("g", "id", "cum")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected && got.size == 4,
      "the NULL group must survive with window-identical cumsums")
  }

  test("groupedRunningSums: N sums under one order ≡ N windows (decimal-exact)") {
    val df = skewed.withColumn("d",
      (col("v") * 7).cast("decimal(18,2)"))
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("rk", sum(lit(1L)).over(w))
      .withColumn("cumd", sum(col("d")).over(w))
      .select("g", "id", "rk", "cumd")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).toPlainString)).toSet
    val got = PrefixSum.groupedRunningSums(df, Seq("g"),
        order = Seq(col("id")),
        bucket = floor(col("id") / 16).cast("long"),
        values = Seq(lit(1L) -> "rk", col("d") -> "cumd"))
      .select("g", "id", "rk", "cumd")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).toPlainString)).toSet
    assert(got == expected,
      "rank and DECIMAL cumulative sum must both match the windows " +
        "bit-for-bit from one kernel pass")
  }

  test("broadcastOffsets=false keeps results identical (shuffle-join path)") {
    val hinted = PrefixSum.groupedRunningSum(skewed, Seq("g"),
        Seq(col("id")), floor(col("id") / 16).cast("long"), col("v"), "cum")
      .select("g", "id", "cum").as[(String, Long, Long)].collect().toSet
    val unhinted = PrefixSum.groupedRunningSum(skewed, Seq("g"),
        Seq(col("id")), floor(col("id") / 16).cast("long"), col("v"), "cum",
        broadcastOffsets = false)
      .select("g", "id", "cum").as[(String, Long, Long)].collect().toSet
    assert(unhinted == hinted)
  }

  test("uniformBucket: weakly monotone, [0,n) bounded, desc mirrors") {
    val df = Seq(-7.5, -1.0, 0.0, 2.25, 2.25, 100.0, 9999.5)
      .toDF("x").repartition(3)
    val asc = PrefixSum.uniformBucket(df, col("x"), 16, "b")
      .orderBy("x").select("x", "b").as[(Double, Long)].collect()
    assert(asc.map(_._2).toSeq == asc.map(_._2).sorted.toSeq,
      "ascending buckets must be non-decreasing in key order")
    assert(asc.forall { case (_, b) => b >= 0 && b < 16 })
    assert(asc.head._2 == 0 && asc.last._2 == 15,
      "min lands in bucket 0, max in bucket n-1")
    // equal keys share a bucket (weak monotonicity includes ties)
    val ties = asc.filter(_._1 == 2.25).map(_._2).distinct
    assert(ties.size == 1)
    val desc = PrefixSum.uniformBucket(df, col("x"), 16, "b",
        descending = true)
      .orderBy(col("x").desc).select("x", "b").as[(Double, Long)].collect()
    assert(desc.map(_._2).toSeq == desc.map(_._2).sorted.toSeq,
      "descending buckets must be non-decreasing in DESC key order")
    assert(desc.head._2 == 0 && desc.last._2 == 15)
  }

  test("uniformBucket: constant key degenerates to bucket 0 (no div-by-0)") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    val got = PrefixSum.uniformBucket(df, col("x"), 8, "b")
      .select("b").as[Long].collect().toSet
    assert(got == Set(0L))
  }

  test("globalNtile ≡ NTILE for even, ragged, and n<k shapes") {
    for ((n, k) <- Seq((12, 4), (10, 4), (7, 3), (2, 5), (1, 1))) {
      val df = scala.util.Random.shuffle((1 to n).toList)
        .toDF("id").withColumn("key", col("id") * 3 % 17)
        .repartition(3)
      val expected = df.withColumn("t",
          ntile(k).over(Window.orderBy(col("key"), col("id"))))
        .select("id", "t").as[(Int, Int)].collect().toSet
      val got = PrefixSum.globalNtile(df, col("key"), descending = false,
          tiebreak = col("id"), k = k, out = "t")
        .select("id", "t").as[(Int, Int)].collect().toSet
      assert(got == expected, s"n=$n k=$k")
      val expectedD = df.withColumn("t",
          ntile(k).over(Window.orderBy(col("key").desc, col("id"))))
        .select("id", "t").as[(Int, Int)].collect().toSet
      val gotD = PrefixSum.globalNtile(df, col("key"), descending = true,
          tiebreak = col("id"), k = k, out = "t")
        .select("id", "t").as[(Int, Int)].collect().toSet
      assert(gotD == expectedD, s"desc n=$n k=$k")
    }
  }

  test("empty input: kernel, bucket cut, and ntile all yield empty, never error") {
    val empty = spark.range(0).select(col("id"),
      (col("id") % 7).as("v"), lit("g").as("g"))
    assert(PrefixSum.groupedRunningSum(empty, Seq("g"), Seq(col("id")),
      floor(col("id") / 16).cast("long"), col("v"), "cum").count() == 0)
    assert(PrefixSum.uniformBucket(empty, col("v"), 8, "b").count() == 0)
    assert(PrefixSum.globalNtile(empty, col("v"), descending = false,
      tiebreak = col("id"), k = 4, out = "t").count() == 0)
  }

  test("multi-column group and composite order (the m07 shape)") {
    val df = skewed.withColumn("m",
      when(col("id") % 3 === 0, "image").otherwise("audio"))
    val w = Window.partitionBy("g", "m").orderBy(col("id"))
    val expected = df.withColumn("rk", row_number().over(w))
      .select("g", "m", "id", "rk").as[(String, String, Long, Int)]
      .collect().map { case (g, m, id, rk) => (g, m, id, rk.toLong) }.toSet
    val got = PrefixSum.groupedRowNumber(df, Seq("g", "m"),
        order = Seq(col("id")),
        bucket = floor(col("id") / 16).cast("long"), out = "rk")
      .select("g", "m", "id", "rk").as[(String, String, Long, Long)]
      .collect().toSet
    assert(got == expected)
  }
}
