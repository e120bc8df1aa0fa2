package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for Verify / Bench / tests.
  *
  * Scale posture (SURVEY.md §7): AQE on (runtime shuffle coalescing +
  * skew-join splitting), shuffle partitions sized to the local core
  * count (the driver exports SPARK_GRAFT_CPUS; a real cluster would
  * size this to executor cores × executors), UTC session timezone for
  * oracle parity, and the legacy nanos flag so the testdata's
  * TIMESTAMP(NANOS) events column is readable (see graft.pipeline.Tables).
  */
object Sessions {
  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
