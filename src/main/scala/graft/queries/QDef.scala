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

object QDef {
  /** Run one query's action and release every cached plan afterwards.
    *
    * A few operators persist() bounded intermediates at plan-build
    * time (q_triangle_support's oriented edge set, q_funnel_steps'
    * per-user step tables) because their plans scan one
    * materialization several times. Those persists are correct inside
    * the query but leak into the SHARED session once the action
    * finishes — and Spark substitutes cached plans into any later
    * query with a matching subtree (the cross-query
    * cache-substitution hazard Curation's scaladoc documents). Every
    * harness main (Bench, Verify, ExplainOne) routes its per-query
    * action through here so release is centralized, not a per-caller
    * workaround; library consumers executing `SparkEntry.queries`
    * directly should do the same after each action. */
  def withCacheRelease[T](spark: SparkSession, df: => DataFrame)(action: DataFrame => T): T =
    try action(df) finally spark.catalog.clearCache()
}
