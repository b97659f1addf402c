package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Engine CLI — the faust introspection commands
  * (`/root/reference/faust/cli/tables.py`, `cli/agents.py`,
  * `cli/models.py`, `cli/send.py`) for this engine:
  *
  *   queries            list every registered query (+oracle coverage)
  *   describe <name>    schema of a query's result at sf0.001
  *   run <name> [sfDir] execute and show a sample
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("queries")
    lazy val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    cmd match {
      case "queries" =>
        println(f"${"name"}%-28s oracle")
        SparkEntry.allQueries.foreach { q =>
          println(f"${q.name}%-28s ${if (q.oracle.isDefined) "duckdb-sql" else "rows-only"}")
        }
      case "describe" =>
        val name = args(1)
        spark.sparkContext.setLogLevel("WARN")
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").printSchema()
      case "run" =>
        val name = args(1)
        val dir = args.lift(2).getOrElse("/root/testdata/sf0.001")
        spark.sparkContext.setLogLevel("WARN")
        SparkEntry.queries(name)(spark, dir).show(20, truncate = false)
      case other =>
        System.err.println(s"unknown command: $other (queries|describe|run)")
        sys.exit(2)
    }
  }
}
