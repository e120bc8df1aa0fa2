package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (suites run in a
  * single forked JVM; getOrCreate dedupes). */
object SparkTesting {
  lazy val spark: SparkSession = {
    val s = Sessions.local("graft-test")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"

  /** AQE's executedPlan.toString echoes the pre-adaptive plan under
    * "== Initial Plan ==" — slice it off before counting exchanges
    * or asserting operator absence (the ONE copy of this idiom). */
  def finalSection(plan: String): String =
    plan.split("== Initial Plan ==").head

  def hashExchanges(plan: String): Int =
    finalSection(plan).linesIterator.count(_.contains("Exchange hashpartitioning"))
}
