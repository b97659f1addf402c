package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the "what did the crawl actually deliver" report
  * every ingestion run starts with (null rates, cardinalities, value
  * ranges per column), same role as faust's table introspection CLI
  * (`faust/cli/tables.py:20-38`) but computed over the data itself.
  *
  * Scale shape: one aggregation LEG PER COLUMN, unioned. Each leg
  * selects only its own column, so the parquet reader prunes to a
  * single column per leg and the total I/O across all legs equals ONE
  * full-table read — whereas the single-pass alternative (k exact
  * `count(distinct)` aggs in one projection) triggers Catalyst's
  * Expand rewrite and multiplies every row k×. Per leg the exact
  * distinct count is the standard 2-exchange partial-distinct plan on
  * a narrow column; legs are independent jobs a scheduler overlaps.
  */
object ProfileOps {

  /** One row per profiled column:
    * (column, n_rows, n_nulls, n_distinct, min_repr, max_repr, avg_len).
    *
    * min/max are computed in the column's own type (numeric min, not
    * lexicographic) and cast to string only for the report; `avg_len`
    * is the mean string-rendered length (integer long/string renderings
    * agree across engines; callers profiling float columns should
    * expect engine-specific formatting there).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          count(lit(1)).minus(count(col(c))).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_repr"),
          max(col(c)).cast("string").as("max_repr"),
          round(avg(length(col(c).cast("string"))), 6).as("avg_len"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_repr"), col("max_repr"), col("avg_len"))
    }.reduce(_ unionByName _)
  }

  /** Snapshot diff between two corpus versions — the dataset-card /
    * reproducibility audit: per id, whether the row was `added`,
    * `removed`, `changed` (content hash differs), or `unchanged`.
    * Content compares by 16-byte MD5, so document text never crosses
    * the join — ONE co-keyed full-outer shuffle on the id regardless
    * of document size; at 100 TB both sides prune to (id, hash)
    * projections at the scan.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   idCol: String, contentCol: String): DataFrame = {
    val a = oldDf.select(col(idCol).as("id"),
      md5(col(contentCol)).as("h_old"))
    val b = newDf.select(col(idCol).as("id"),
      md5(col(contentCol)).as("h_new"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"),
        col("h_old"), col("h_new"))
  }
}
