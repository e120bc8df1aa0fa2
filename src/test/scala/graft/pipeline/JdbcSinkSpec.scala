package graft.pipeline

import java.nio.file.Files
import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** JDBC latest-snapshot export (CONTRIBUTING.md:9 wishlist) against
  * an embedded Derby — the loopback stand-in for Postgres: same ANSI
  * MERGE, same Spark JDBC writer, zero egress. The invariants are
  * E2's, re-proven through a database: replay is a no-op, stale rows
  * never downgrade, fresher rows win by (updatedAt, extractedAt). */
class JdbcSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  private def freshUrl(): String = {
    val dir = Files.createTempDirectory("jdbc_sink").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  private val props = new Properties

  private def readBack(url: String, table: String) =
    spark.read.jdbc(url, table, props)
      .selectExpr("id", "email", "udate", "extracted_at")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet

  private def df(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "email", "udate", "extracted_at")
  }

  test("export + replay is idempotent; fresher wins; stale never downgrades") {
    val url = freshUrl()
    val snap1 = df(
      (1L, "a@x.com", "2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z"),
      (2L, "b@x.com", "2026-01-03T00:00:00Z", "2026-01-04T00:00:00Z"))

    // first export creates the table and inserts everything
    assert(JdbcSink.exportLatest(spark, snap1, url, "contacts",
      Seq("id"), Seq("udate", "extracted_at"), props = props) == 2L)
    val after1 = readBack(url, "contacts")
    assert(after1 == Set(
      (1L, "a@x.com", "2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z"),
      (2L, "b@x.com", "2026-01-03T00:00:00Z", "2026-01-04T00:00:00Z")))

    // replaying the SAME snapshot: equal order tuples → no update, no
    // insert, bit-identical target (the E2 re-run invariant)
    assert(JdbcSink.exportLatest(spark, snap1, url, "contacts",
      Seq("id"), Seq("udate", "extracted_at"), props = props) == 2L)
    assert(readBack(url, "contacts") == after1)

    // a mixed delta: id=1 FRESHER (updates), id=2 STALE (must not
    // downgrade), id=3 new (inserts)
    val snap2 = df(
      (1L, "a2@x.com", "2026-02-01T00:00:00Z", "2026-02-02T00:00:00Z"),
      (2L, "stale@x.com", "2025-01-01T00:00:00Z", "2025-01-01T00:00:00Z"),
      (3L, "c@x.com", "2026-01-05T00:00:00Z", "2026-01-06T00:00:00Z"))
    assert(JdbcSink.exportLatest(spark, snap2, url, "contacts",
      Seq("id"), Seq("udate", "extracted_at"), props = props) == 3L)
    assert(readBack(url, "contacts") == Set(
      (1L, "a2@x.com", "2026-02-01T00:00:00Z", "2026-02-02T00:00:00Z"),
      (2L, "b@x.com", "2026-01-03T00:00:00Z", "2026-01-04T00:00:00Z"),
      (3L, "c@x.com", "2026-01-05T00:00:00Z", "2026-01-06T00:00:00Z")))
  }

  test("order tie on the first column falls through to the second " +
      "(latestSnapshot's lexicographic tiebreak)") {
    val url = freshUrl()
    val base = df((7L, "old@x.com", "2026-01-01T00:00:00Z", "2026-01-01T00:00:00Z"))
    JdbcSink.exportLatest(spark, base, url, "contacts",
      Seq("id"), Seq("udate", "extracted_at"), props = props)

    // same udate, LATER extraction → re-extraction of the same
    // upstream state wins, exactly like latestSnapshot's tiebreak
    val reExtract = df((7L, "new@x.com", "2026-01-01T00:00:00Z", "2026-01-09T00:00:00Z"))
    JdbcSink.exportLatest(spark, reExtract, url, "contacts",
      Seq("id"), Seq("udate", "extracted_at"), props = props)
    assert(readBack(url, "contacts") ==
      Set((7L, "new@x.com", "2026-01-01T00:00:00Z", "2026-01-09T00:00:00Z")))

    // same udate, EARLIER extraction → loses
    val older = df((7L, "older@x.com", "2026-01-01T00:00:00Z", "2026-01-05T00:00:00Z"))
    JdbcSink.exportLatest(spark, older, url, "contacts",
      Seq("id"), Seq("udate", "extracted_at"), props = props)
    assert(readBack(url, "contacts") ==
      Set((7L, "new@x.com", "2026-01-01T00:00:00Z", "2026-01-09T00:00:00Z")))
  }

  test("mid-export crash: a leftover staging table (loaded, never merged) " +
      "leaves the target unharmed and the next export recovers") {
    val url = freshUrl()
    val snap1 = df(
      (1L, "a@x.com", "2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z"),
      (2L, "b@x.com", "2026-01-03T00:00:00Z", "2026-01-04T00:00:00Z"))
    JdbcSink.exportLatest(spark, snap1, url, "contacts",
      Seq("id"), Seq("udate", "extracted_at"), props = props)
    val healthy = readBack(url, "contacts")

    // simulate a run that DIED between the staging bulk-load and the
    // MERGE: staging exists with in-flight rows, no merge, no drop —
    // exactly the state a killed executor-complete/driver-dead export
    // leaves behind (steps 1 and 2 of exportLatest are not atomic)
    val crashed = df((1L, "SHOULD-NEVER-LAND@x.com",
      "2026-09-09T00:00:00Z", "2026-09-09T00:00:00Z"))
    crashed.write.mode("overwrite").option("createTableColumnTypes",
      "email VARCHAR(4096), udate VARCHAR(4096), extracted_at VARCHAR(4096)")
      .jdbc(url, "contacts_stage", props)
    // the crash itself cannot have touched the target: the only writer
    // of the target is the MERGE, which never ran
    assert(readBack(url, "contacts") == healthy,
      "a crash before the MERGE must leave the target byte-identical")

    // next scheduled export: mode(overwrite) replaces the orphaned
    // staging table, and ONLY the new snapshot's rows merge — the
    // dead run's in-flight rows are discarded, not replayed
    val snap2 = df(
      (1L, "a@x.com", "2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z"),
      (2L, "b2@x.com", "2026-02-03T00:00:00Z", "2026-02-04T00:00:00Z"))
    assert(JdbcSink.exportLatest(spark, snap2, url, "contacts",
      Seq("id"), Seq("udate", "extracted_at"), props = props) == 2L)
    assert(readBack(url, "contacts") == Set(
      (1L, "a@x.com", "2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z"),
      (2L, "b2@x.com", "2026-02-03T00:00:00Z", "2026-02-04T00:00:00Z")),
      "recovery export must merge only its own snapshot")
    // and the recovered run cleaned its staging table up
    val c = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = c.getMetaData.getTables(null, null, "CONTACTS_STAGE", Array("TABLE"))
      try assert(!rs.next(), "staging must be dropped after a successful merge")
      finally rs.close()
    } finally c.close()
  }

  test("numPartitions > 1: the staging load runs PARALLEL JDBC writers " +
      "(one task per partition) and the merge still converges") {
    val url = freshUrl()
    val rows = (1L to 97L).map(i =>
      (i, s"u$i@x.com", f"2026-01-${i % 28 + 1}%02dT00:00:00Z", "2026-02-01T00:00:00Z"))
    // listener: capture the task count of the JDBC save stage(s)
    val saveTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (sc.stageInfo.name.contains("jdbc") ||
            sc.stageInfo.details.contains("saveTable"))
          saveTasks.addAndGet(sc.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(JdbcSink.exportLatest(spark, df(rows: _*), url, "contacts",
        Seq("id"), Seq("udate", "extracted_at"), numPartitions = 4,
        props = props) == 97L)
      // listener events are delivered async; poll briefly
      val deadline = System.currentTimeMillis + 30000
      while (saveTasks.get() < 4 && System.currentTimeMillis < deadline)
        Thread.sleep(100)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(saveTasks.get() >= 4,
      s"expected a 4-task parallel JDBC load stage, saw ${saveTasks.get()} tasks")
    assert(readBack(url, "contacts").size == 97,
      "all partitions' rows must land exactly once")
  }

  test("exportAll ships a real PersistTableDual lake and re-running the " +
      "E2 merge + export converges (end-to-end idempotence)") {
    import spark.implicits._
    val url = freshUrl()
    val root = Files.createTempDirectory("jdbc_lake").toString
    val paths = PersistTableDual.Paths(root, "deals")
    val d1 = Seq((10L, "open", "2026-01-01"), (11L, "won", "2026-01-02"))
      .toDF("id", "status", "udate")
    PersistTableDual.persist(spark, paths, d1, "run1",
      "2026-01-03T00:00:00Z", Seq("id"), "udate")

    val keys = Map("deals" -> ((Seq("id"), Seq("udate", "extracted_at"))))
    assert(JdbcSink.exportAll(spark, root, url, keys, props) == Map("deals" -> 2L))

    // an E2 merge of a newer delta, then export again: the database
    // converges to master/latest
    val d2 = Seq((11L, "lost", "2026-02-01"), (12L, "open", "2026-02-02"))
      .toDF("id", "status", "udate")
    PersistTableDual.persist(spark, paths, d2, "run2",
      "2026-02-03T00:00:00Z", Seq("id"), "udate")
    assert(JdbcSink.exportAll(spark, root, url, keys, props) == Map("deals" -> 3L))
    val got = spark.read.jdbc(url, "deals", props)
      .selectExpr("id", "status").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((10L, "open"), (11L, "lost"), (12L, "open")))

    // replay the export with no new merge: unchanged
    assert(JdbcSink.exportAll(spark, root, url, keys, props) == Map("deals" -> 3L))
  }
}
