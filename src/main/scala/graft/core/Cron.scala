package graft.core

import java.time.{Instant, ZoneId, ZonedDateTime}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Five-field cron expression — faust `@app.crontab(expr, tz)`
  * (`/root/reference/faust/app/base.py:1003-1055`,
  * `faust/utils/cron.py`, which delegates to croniter).
  *
  * Field order: minute hour day-of-month month day-of-week. Grammar
  * per field: `*`, `n`, `a-b`, `* / n` and `a-b / n` steps, and comma
  * lists thereof. Day-of-week 0-7 with both 0 and 7 = Sunday.
  * Standard (vixie) day rule: when BOTH day fields are restricted a
  * timestamp matches if EITHER does; otherwise both must (a `*` field
  * matches trivially).
  *
  * Pure values + functions — property-testable without a
  * SparkSession; [[CronExpr.column]] lowers the same predicate to
  * Catalyst columns (codegen'd, no UDF) for filtering tick streams.
  */
final case class CronExpr(minutes: Set[Int], hours: Set[Int],
                          dom: Set[Int], months: Set[Int], dow: Set[Int],
                          domRestricted: Boolean, dowRestricted: Boolean) {

  /** Does the minute containing `epochSecond` match, on `zone`'s
    * wall clock? DST is the zone rules' business: a skipped wall-clock
    * hour never matches (those minutes don't exist locally) and a
    * repeated one matches twice — same as running cron on a machine in
    * that zone.
    */
  def matches(epochSecond: Long, zone: ZoneId): Boolean = {
    val t = ZonedDateTime.ofInstant(Instant.ofEpochSecond(epochSecond), zone)
    val dayOk =
      if (domRestricted && dowRestricted)
        dom(t.getDayOfMonth) || dow(t.getDayOfWeek.getValue % 7)
      else dom(t.getDayOfMonth) && dow(t.getDayOfWeek.getValue % 7)
    minutes(t.getMinute) && hours(t.getHour) && months(t.getMonthValue) && dayOk
  }

  /** The same predicate over a timestamp column (UTC instants), as
    * pure Catalyst expressions. `dayofweek` is Sun=1..Sat=7 in Spark →
    * cron's Sun=0 is `dayofweek - 1`.
    */
  def column(ts: Column, tz: String): Column = {
    val local = from_utc_timestamp(ts, tz)
    def setPred(c: Column, s: Set[Int], full: Int): Column =
      if (s.size >= full) lit(true) else c.isin(s.toSeq.sorted.map(Integer.valueOf): _*)
    val domP = setPred(dayofmonth(local), dom, 31)
    val dowP = setPred(dayofweek(local) - 1, dow, 7)
    val dayOk =
      if (domRestricted && dowRestricted) domP || dowP else domP && dowP
    setPred(minute(local), minutes, 60) &&
      setPred(hour(local), hours, 24) &&
      setPred(month(local), months, 12) && dayOk
  }
}

object CronExpr {

  /** Parse a 5-field expression; throws IllegalArgumentException on
    * malformed input (faust fails at decoration time too).
    */
  def parse(expr: String): CronExpr = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5,
      s"cron expression needs 5 fields, got ${fields.length}: '$expr'")
    val mins = parseField(fields(0), 0, 59)
    val hrs = parseField(fields(1), 0, 23)
    val dom = parseField(fields(2), 1, 31)
    val mon = parseField(fields(3), 1, 12)
    // dow: accept 0-7, normalize 7 → 0 (both mean Sunday)
    val dowRaw = parseField(fields(4), 0, 7)
    val dow = dowRaw.map(d => if (d == 7) 0 else d)
    CronExpr(mins, hrs, dom, mon, dow,
      domRestricted = fields(2) != "*",
      dowRestricted = fields(4) != "*")
  }

  private def parseField(f: String, lo: Int, hi: Int): Set[Int] =
    f.split(",").toSet.flatMap { part: String =>
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) =>
          val st = s.toInt
          require(st > 0, s"cron step must be positive: '$part'")
          (r, st)
        case _ => throw new IllegalArgumentException(s"bad cron term '$part'")
      }
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-")
          (x.toInt, y.toInt)
        case n => val v = n.toInt; (v, v)
      }
      require(a >= lo && b <= hi && a <= b,
        s"cron value out of range [$lo,$hi]: '$part'")
      (a to b by step).toSet
    }
}
