package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: the Spark plan and (when
  * ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-compares against (SURVEY.md §5). `oracle = None` → driver
  * records a weaker rows-only check. */
final case class QDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
