package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with the
  * same key and `rightTs <= leftTs` — the operator the reference's
  * sliding-window doc comment gestures at (`faust/windows.py:116-132`)
  * and time-series engines ship natively; Spark has no built-in.
  *
  * Implementation is the scalable union-and-carry pattern, NOT a range
  * join: tag both sides, sort within key by (ts, side), and carry the
  * last right value forward with `last_value(ignoreNulls)` over a
  * running window. One shuffle on the key, linear work, no pair
  * explosion — this survives 100 TB where an inequality join cannot.
  *
  * Ambiguity contract: if several right rows share (key, ts), the one
  * with the greatest `rightIdCol` wins (callers wanting DuckDB
  * `ASOF JOIN` parity should pre-dedup to one right row per (key, ts),
  * which [[dedupRight]] does).
  */
object AsOfJoin {

  /** As-of join through the custom Catalyst operator
    * ([[graft.plans.AsOfJoinPlan]]): one shuffle + sort per side, then
    * a single merge pass per partition. Same contract as [[join]]
    * (verified equal in AsOfJoinSpec); this form gives the planner a
    * first-class node — distribution requirements compose with
    * existing layouts (bucketed input ⇒ zero shuffles).
    *
    * Right-side column names must not clash with left's (rename
    * before the call); right rows should be unique per (key, ts) —
    * see [[dedupRight]].
    */
  def joinNative(left: DataFrame, right: DataFrame,
                 leftKey: String, leftTs: String,
                 rightKey: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(lPlan, leftTs),
        attr(rPlan, rightKey), attr(rPlan, rightTs)))
  }

  /** Idempotent, synchronized strategy/rule registration for sessions
    * NOT built with `GraftExtensions` (the preferred path —
    * `.config("spark.sql.extensions", "graft.GraftExtensions")`
    * registers at session build and makes this a no-op-equivalent).
    * The lock serializes the check-then-append on the session-global
    * `spark.experimental` so concurrent first callers can't register
    * the strategy twice; registration is session-wide by nature (it's
    * the same mutation GraftExtensions performs).
    */
  private def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    registrationLock.synchronized {
      if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
      if (!spark.experimental.extraOptimizations
          .contains(graft.plans.PushFilterThroughAsOfJoin))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.PushFilterThroughAsOfJoin
    }

  private val registrationLock = new Object

  def dedupRight(right: DataFrame, keyCol: String, tsCol: String,
                 idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(tsCol)).orderBy(col(idCol).desc)
    right.withColumn("_rk", row_number().over(w)).where(col("_rk") === 1).drop("_rk")
  }

  /** @param left     rows to enrich; must have keyCol, tsCol, leftIdCol
    * @param right    rows to look up; must have keyCol, tsCol, rightIdCol
    * @param payload  right columns to carry onto matches (besides id)
    * @return left rows + matched right id/ts/payload (nulls if no match)
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           leftIdCol: String, rightIdCol: String,
           payload: Seq[String] = Nil): DataFrame = {
    // the whole matched right row travels as ONE struct so nullable
    // payload fields stay attributed to their own row — carrying each
    // payload column through its own last(ignoreNulls) would let a null
    // payload fall back to a stale older row's value.
    val rightStruct = struct(
      col(rightIdCol).as("id") +: col(tsCol).cast("long").as("ts") +:
        payload.map(p => col(p).as(p)): _*)
    val rightStructType = right.select(rightStruct.as("_r")).schema("_r").dataType
    val lCols = Seq(
      col(keyCol).as("_key"), col(tsCol).as("_ts"), lit(1).as("_side"),
      col(leftIdCol).as("_left_id"),
      lit(null).cast(rightStructType).as("_r"))
    val rCols = Seq(
      col(keyCol).as("_key"), col(tsCol).as("_ts"), lit(0).as("_side"),
      lit(null).cast(left.schema(leftIdCol).dataType).as("_left_id"),
      rightStruct.as("_r"))
    val l = left.select(lCols: _*)
    val r = right.select(rCols: _*)
    // right rows sort before left rows at equal ts (_side 0 < 1): a
    // left row at ts T matches a right row at exactly T — the `<=`
    // as-of convention.
    val w = Window.partitionBy("_key")
      .orderBy(col("_ts"), col("_side"), col("_r.id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
    carried.where(col("_side") === 1)
      .select(col("_key").as(keyCol) +: col("_ts").as(tsCol) +:
        col("_left_id").as(leftIdCol) +: col("_m.id").as("asof_id") +:
        col("_m.ts").as("asof_ts") +:
        payload.map(p => col(s"_m.$p").as(s"asof_$p")): _*)
  }

  /** FORWARD as-of: for every left row, the NEAREST right row with
    * `rightTs >= leftTs` (pandas `merge_asof(direction="forward")`,
    * DuckDB `ASOF ... ON r.ts >= l.ts`). Implemented as [[join]] on
    * negated timestamps — same one-shuffle union-and-carry plan; ties
    * at equal negated (key, ts) resolve to the greatest `rightIdCol`,
    * matching [[join]]'s contract.
    */
  def joinForward(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, leftIdCol: String, rightIdCol: String,
                  payload: Seq[String] = Nil): DataFrame = {
    def neg(df: DataFrame) = df.withColumn(tsCol, -col(tsCol))
    join(neg(left), neg(right), keyCol, tsCol, leftIdCol, rightIdCol, payload)
      .withColumn(tsCol, -col(tsCol))
      .withColumn("asof_ts", -col("asof_ts"))
  }

  /** Tolerance post-filter (pandas `merge_asof(tolerance=...)`): null
    * the matched columns when the timestamp gap exceeds `tolerance`
    * (absolute — works for both directions). Left rows are kept, as in
    * the left-join contract.
    */
  def withTolerance(joined: DataFrame, tsCol: String, tolerance: Long,
                    payload: Seq[String] = Nil): DataFrame = {
    val ok = abs(col(tsCol) - col("asof_ts")) <= tolerance
    val matchedCols = Seq("asof_id", "asof_ts") ++ payload.map("asof_" + _)
    matchedCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(ok, col(c)))
    }
  }
}
