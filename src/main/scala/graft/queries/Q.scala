package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query plus (when SQL-expressible) its DuckDB oracle.
  * Queries without an oracle get the driver's weaker rows-only check —
  * they must still be fully deterministic.
  */
case class Q(name: String,
             run: (SparkSession, String) => DataFrame,
             oracle: Option[String])
