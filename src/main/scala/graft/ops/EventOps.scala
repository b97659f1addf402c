package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream — the funnel /
  * conversion-path operators a product-analytics pipeline runs on the
  * same engine the training pipeline does.
  *
  * Reference behavior: faust apps hand-roll this shape with per-key
  * tables holding "last seen step" state (the pattern its docs'
  * page-view examples gesture at); here it is one declarative plan.
  */
object EventOps {

  /** Ordered-funnel timestamps per user: for `steps = Seq(a, b, c)`,
    * each user's earliest `a`, then the earliest `b` STRICTLY AFTER
    * that `a`, then the earliest `c` strictly after that `b` — the
    * standard conversion-funnel semantics (a click before the view
    * does not convert; re-orderings never count backwards in time).
    * Output: one row per user who entered the funnel (has step 1),
    * with `<step>_ts` columns, null where the user never reached the
    * step.
    *
    * Scale shape: one bounded groupBy per step on the SAME user key —
    * every shuffle is hash-partitioned on `userCol`, so the planner
    * reuses the exchange, and each step's input is pre-filtered to
    * one event type and semi-bounded by the previous step's
    * survivors. No windows, no per-user sorted state — at 100 TB the
    * cost is `steps` narrow-key partial aggs, not an event sort.
    */
  def funnelSteps(df: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val first = df.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"${steps.head}_ts"))
    steps.drop(1).foldLeft((first, s"${steps.head}_ts")) {
      case ((acc, prev), st) =>
        val nxt = df.where(col(typeCol) === st)
          .join(acc.select(col(userCol), col(prev)), Seq(userCol))
          .where(col(tsCol) > col(prev))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"${st}_ts"))
        (acc.join(nxt, Seq(userCol), "left"), s"${st}_ts")
    }._1
  }
}
