package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

class PagedSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  private def read(opts: (String, String)*) = {
    FixtureBackend.reset()
    spark.read.format("graft.sources.PagedSource")
      .options(opts.toMap).load()
  }

  test("full paginated scan: all rows, parallel page-range partitions (S4)") {
    val df = read("totalrows" -> "1000", "pagelimit" -> "100",
      "pagesperpartition" -> "2")
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 5) // 10 pages / 2 per partition
  }

  test("keyset pushdown prunes whole pages at planning time (S5)") {
    val df = read("totalrows" -> "1000", "pagelimit" -> "100",
      "pagesperpartition" -> "1")
    val filtered = df.filter(df("id") > 850L)
    assert(filtered.count() == 149)
    // pages 0..7 are skipped: only pages 8 and 9 fetched
    assert(FixtureBackend.fetches.get() == 2,
      s"expected 2 page fetches, got ${FixtureBackend.fetches.get()}")
  }

  test("transient 503s retried with backoff, scan succeeds (S6)") {
    val df = read("totalrows" -> "200", "pagelimit" -> "100",
      "failattempts" -> "2", "maxretries" -> "6", "backoffbasems" -> "1")
    assert(df.count() == 200)
  }

  test("retries exhausted → scan fails (S6)") {
    val df = read("totalrows" -> "100", "pagelimit" -> "100",
      "failattempts" -> "99", "maxretries" -> "2", "backoffbasems" -> "1")
    intercept[Exception] { df.count() }
  }

  test("404 endpoint → empty result, not a failed job (S7)") {
    val df = read("totalrows" -> "100", "notfound" -> "true")
    assert(df.count() == 0)
  }

  test("unknown total: sequential scan terminates on short page (O3)") {
    val df = read("totalrows" -> "250", "pagelimit" -> "100",
      "advertisetotal" -> "false")
    assert(df.rdd.getNumPartitions == 1) // sequential walk
    assert(df.count() == 250)
    // pages 0,1 full + page 2 short (50) → exactly 3 fetches, no probe past
    assert(FixtureBackend.fetches.get() == 3)
  }

  test("unknown total + watermark: sequential walk starts past the watermark") {
    val df = read("totalrows" -> "1000", "pagelimit" -> "100",
      "advertisetotal" -> "false")
    val filtered = df.filter(df("id") > 850L)
    assert(filtered.count() == 149)
    // starts at page 8, walks 8,9 full + 10 empty-short → 3 fetches,
    // not a re-walk of all 10 history pages
    assert(FixtureBackend.fetches.get() == 3,
      s"expected 3 page fetches, got ${FixtureBackend.fetches.get()}")
  }

  test("streaming offset never regresses when upstream shrinks (throttled mode)") {
    import spark.implicits._
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(100)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "10")
      .option("maxrowspertrigger", "30").load()
    val q = stream.writeStream.format("memory").queryName("paged_shrink").start()
    try {
      q.processAllAvailable()
      // upstream "shrinks" below the committed offset, then regrows
      FixtureBackend.dynamicTotal.set(50)
      q.processAllAvailable()
      FixtureBackend.dynamicTotal.set(150)
      q.processAllAvailable()
      val (n, distinct) = spark.sql(
        "SELECT count(*), count(DISTINCT id) FROM paged_shrink")
        .as[(Long, Long)].head()
      assert(n == 150, s"expected 150 rows, got $n")
      assert(distinct == 150, "shrink+regrow must not re-emit processed ids")
    } finally q.stop()
  }

  test("micro-batch stream: keyset offsets advance as upstream grows (S5 streaming)") {
    import spark.implicits._
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(250)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "100").load()
    val q = stream.writeStream.format("memory").queryName("paged_stream").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM paged_stream").head().getLong(0) == 250)
      // upstream grows between triggers → next batch reads only [250, 400)
      FixtureBackend.dynamicTotal.set(400)
      q.processAllAvailable()
      val (n, distinct) = spark.sql(
        "SELECT count(*), count(DISTINCT id) FROM paged_stream")
        .as[(Long, Long)].head()
      assert(n == 400)          // no re-reads
      assert(distinct == 400)   // no duplicates
      assert(spark.sql("SELECT min(id), max(id) FROM paged_stream")
        .as[(Long, Long)].head() == ((0L, 399L)))
    } finally q.stop()
  }

  test("admission control: maxrowspertrigger caps each micro-batch (backpressure)") {
    FixtureBackend.reset()
    FixtureBackend.dynamicTotal.set(100)
    val stream = spark.readStream.format("graft.sources.PagedSource")
      .option("dynamictotal", "true").option("pagelimit", "10")
      .option("maxrowspertrigger", "30").load()
    val q = stream.writeStream.format("memory").queryName("paged_throttled").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM paged_throttled").head().getLong(0) == 100)
      // 100 rows / ≤30 per trigger → at least 4 micro-batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 4, s"expected >=4 throttled batches, got $batches")
    } finally q.stop()
  }
}
