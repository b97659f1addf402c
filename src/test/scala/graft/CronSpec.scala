package graft

import java.time.{LocalDateTime, ZoneId, ZonedDateTime}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.Timers
import graft.core.CronExpr

/** faust `@app.crontab` parity (`faust/app/base.py:1003-1055`,
  * `faust/utils/cron.py`): pure 5-field matcher incl. DST/tz
  * boundaries, the matcher↔Column equivalence, and one streaming tick
  * test through the cronFilter plumbing.
  */
class CronSpec extends SparkTestBase {

  import spark.implicits._

  private val utc = ZoneId.of("UTC")

  private def epoch(s: String, zone: ZoneId): Long =
    LocalDateTime.parse(s).atZone(zone).toEpochSecond

  test("parse: fields, lists, ranges, steps, dow 7=0") {
    val c = CronExpr.parse("*/15 9-17 1,15 */3 1-5")
    assert(c.minutes == Set(0, 15, 30, 45))
    assert(c.hours == (9 to 17).toSet)
    assert(c.dom == Set(1, 15))
    assert(c.months == Set(1, 4, 7, 10))
    assert(c.dow == (1 to 5).toSet)
    assert(CronExpr.parse("* * * * 7").dow == Set(0))
    assert(CronExpr.parse("* * * * 0").dow == Set(0))
    intercept[IllegalArgumentException](CronExpr.parse("* * * *"))
    intercept[IllegalArgumentException](CronExpr.parse("61 * * * *"))
    intercept[IllegalArgumentException](CronExpr.parse("* * 0 * *"))
  }

  test("matches: minute/hour/month and vixie day-OR rule") {
    val c = CronExpr.parse("30 14 * * *")
    assert(c.matches(epoch("2024-06-10T14:30:10", utc), utc))
    assert(!c.matches(epoch("2024-06-10T14:31:00", utc), utc))
    // both day fields restricted → OR (vixie): June 1 2024 is a Saturday
    val or = CronExpr.parse("0 0 1 * 1")
    assert(or.matches(epoch("2024-06-01T00:00:00", utc), utc))  // dom hits
    assert(or.matches(epoch("2024-06-03T00:00:00", utc), utc))  // Monday hits
    assert(!or.matches(epoch("2024-06-04T00:00:00", utc), utc)) // neither
    // only dow restricted → AND with trivial dom
    val and = CronExpr.parse("0 0 * * 1")
    assert(!and.matches(epoch("2024-06-01T00:00:00", utc), utc))
    assert(and.matches(epoch("2024-06-03T00:00:00", utc), utc))
  }

  test("DST spring-forward: skipped wall-clock minutes never match") {
    // Europe/Berlin 2024-03-31: 02:00→03:00 local does not exist
    val berlin = ZoneId.of("Europe/Berlin")
    val c = CronExpr.parse("30 2 * * *")
    // every instant of that UTC day: local 02:30 never occurs
    val dayStart = ZonedDateTime.parse("2024-03-31T00:00:00Z").toEpochSecond
    val anyMatch = (0 until 24 * 60).exists(m => c.matches(dayStart + m * 60L, berlin))
    assert(!anyMatch)
    // the day before, it fires exactly once
    val prev = ZonedDateTime.parse("2024-03-30T00:00:00Z").toEpochSecond
    assert((0 until 24 * 60).count(m => c.matches(prev + m * 60L, berlin)) == 1)
  }

  test("DST fall-back: repeated wall-clock minute matches twice") {
    // America/New_York 2024-11-03: 01:30 EDT (05:30Z) and 01:30 EST (06:30Z)
    val ny = ZoneId.of("America/New_York")
    val c = CronExpr.parse("30 1 * * *")
    val dayStart = ZonedDateTime.parse("2024-11-03T00:00:00Z").toEpochSecond
    val hits = (0 until 24 * 60).filter(m => c.matches(dayStart + m * 60L, ny))
      .map(m => dayStart + m * 60L)
    assert(hits.size == 2)
    assert(hits.contains(ZonedDateTime.parse("2024-11-03T05:30:00Z").toEpochSecond))
    assert(hits.contains(ZonedDateTime.parse("2024-11-03T06:30:00Z").toEpochSecond))
  }

  test("timezone: same instant, different local match") {
    val tokyo = ZoneId.of("Asia/Tokyo") // UTC+9, no DST
    val c = CronExpr.parse("0 9 * * *")
    val inst = epoch("2024-06-10T09:00:00", tokyo)
    assert(c.matches(inst, tokyo))
    assert(!c.matches(inst, utc)) // 00:00 UTC
  }

  test("Column predicate agrees with the pure matcher (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    val exprs = Seq("*/5 * * * *", "0 */6 1,15 * *", "30 14 * 6 1-5",
      "0 0 1 * 1", "15 3 * * 0")
    val zones = Seq("UTC", "Europe/Berlin", "America/New_York", "Asia/Tokyo")
    val base = ZonedDateTime.parse("2024-01-01T00:00:00Z").toEpochSecond
    val instants = Seq.fill(300)(base + rnd.nextLong(365L * 24 * 3600) / 60 * 60)
    val df = instants.toDF("es")
      .withColumn("ts", timestamp_seconds(col("es")))
    for (e <- exprs; z <- zones) {
      val cron = CronExpr.parse(e)
      val got = df.withColumn("m", cron.column(col("ts"), z))
        .select("es", "m").as[(Long, Boolean)].collect().toMap
      val zone = ZoneId.of(z)
      instants.foreach { i =>
        assert(got(i) == cron.matches(i, zone), s"expr=$e tz=$z instant=$i")
      }
    }
  }

  test("streaming crontab ticks: only matching minutes pass the filter") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val ticksDf = input.toDS().toDF("es")
      .withColumn("timestamp", timestamp_seconds(col("es")))
    val filtered = Timers.cronFilter(ticksDf, "*/15 * * * *", "UTC")
    val q = filtered.writeStream.format("memory").queryName("cron_out")
      .outputMode("append").start()
    try {
      val t0 = epoch("2024-06-10T14:00:00", utc)
      // one tick per second over 16 minutes
      input.addData((0 until 16 * 60).map(s => t0 + s): _*)
      q.processAllAvailable()
      val fired = spark.table("cron_out").select("es").as[Long].collect().sorted
      assert(fired.toSeq == Seq(t0, t0 + 15 * 60)) // :00 and :15, second 0 only
    } finally q.stop()
  }
}
