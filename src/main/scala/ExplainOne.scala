object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("explain-one")
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    graft.queries.QDef.withCacheRelease(spark,
      graft.SparkEntry.queries(name)(spark, sf)) { df =>
      df.explain("formatted")
      val t0 = System.nanoTime(); val n = df.count()
      val t1 = System.nanoTime(); df.count()
      println(f"[explain-one] $name rows=$n run1=${(t1 - t0) / 1e9}%.3f run2=${(System.nanoTime() - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
