package graft

/** Per-round benchmark main: times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver
  * (BENCH_r{N}.json). Uses the shared Sessions.local config (AQE,
  * UTC, nanosAsLong) — the same session the correctness gate runs
  * under, so a bench timing is always a timing of the *correct* plan. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT/parquet-footer paths so the alphabetically
    // first query doesn't absorb ~4s of one-time session cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("customer", "orders", "lineitem", "events", "documents", "embeddings")
      .foreach(n => spark.read.parquet(s"$sfDir/$n.parquet").limit(1).count())
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} FAILED: ${failed.sorted.mkString(", ")}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
