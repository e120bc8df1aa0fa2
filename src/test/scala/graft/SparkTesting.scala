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
}
