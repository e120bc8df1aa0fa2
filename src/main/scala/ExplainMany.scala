/** Batch plan dumper for the r17 optimization round: writes
  * `<outDir>/<query>_<tag>.txt` with the formatted physical plan of
  * every named query (or, with the single name `@top`, a built-in
  * candidate list) — one JVM instead of one sbt fork per query.
  *
  * Usage: runMain ExplainMany <outDir> <tag> <q1> [q2 ...] [sfDir]
  * (a trailing arg containing '/' is taken as the sf dir).
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val (names, sf) =
      if (args.last.contains("/")) (args.drop(2).dropRight(1).toSeq, args.last)
      else (args.drop(2).toSeq, "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("explain-many")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      graft.queries.QDef.withCacheRelease(spark, fn(spark, sf)) { df =>
        // Execute THIS queryExecution first so the dumped plan is the
        // FINAL adaptive plan — runtime ReusedExchange / AQE
        // coalescing included, not the pre-execution guess. (A noop
        // write would be a separate QueryExecution and leave this
        // plan unfinalized.) toRdd.count() evaluates every column of
        // every row like the noop sink.
        spark.sparkContext.setJobDescription(s"explain:$name")
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val qe = df.queryExecution
        val txt = qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
          (f"-- noop-sink wall: $secs%.3f s (single run, loaded-machine " +
            f"indicative only; bench numbers are the record)%n$txt")
            .getBytes("UTF-8"))
        println(f"[explain-many] wrote $name ($tag) noop=$secs%.3f s")
      }
    }
    spark.stop()
  }
}
