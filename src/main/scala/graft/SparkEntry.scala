package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CoreQueries, GraphStatQueries, QDef, RelQueries, SimQueries, TextQueries, TrainPrepQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2): each
  * entry is verified by the driver against its `oracleSql` DuckDB
  * equivalent on /root/testdata parquet. Registries live under
  * graft.queries.*; this object only aggregates them.
  */
object SparkEntry {

  private def registry: Seq[QDef] =
    CoreQueries.all ++ TextQueries.all ++ SimQueries.all ++ TrainPrepQueries.all ++
      AnalyticsQueries.all ++ GraphStatQueries.all ++ RelQueries.all

  /** Flagship query (SURVEY.md §3 E3 build_chatter_master): unified,
    * enriched, chronologically sorted per-contact event timeline.
    * Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    pipeline.ChatterMaster.chatterMaster(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver falls back to a rows-only check). */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
