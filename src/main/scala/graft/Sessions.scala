package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for Verify / Bench / tests.
  *
  * Scale posture (SURVEY.md §7): AQE on (runtime shuffle coalescing +
  * skew-join splitting), shuffle partitions sized to the local core
  * count (the driver exports SPARK_GRAFT_CPUS; a real cluster would
  * size this to executor cores × executors), and UTC session timezone
  * for oracle parity (graft.pipeline.Tables reinterprets the events
  * TIMESTAMP_NTZ column as UTC instants against it — the zone is
  * correctness-bearing, not cosmetic).
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
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
