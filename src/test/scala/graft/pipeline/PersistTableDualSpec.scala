package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.pipeline.PersistTableDual.{Paths, persist}

/** The reference's core invariant (run_ac_extraction.py:159-188):
  * re-persisting the same delta leaves master/raw unchanged; updates
  * win in master/latest by updated_at. */
class PersistTableDualSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  private def freshPaths() =
    Paths(Files.createTempDirectory("ptd").toString, "contacts")

  private def delta(rows: (String, String, String)*) =
    rows.toDF("contact_id", "email", "updated_at")

  test("idempotent merge: same delta twice → raw unchanged") {
    val p = freshPaths()
    val d = delta(("1", "a@x", "2024-01-01"), ("2", "b@x", "2024-01-01"))
    val (raw1, latest1) = persist(spark, p, d, "r1", "2026-01-01T00:00:00Z",
      Seq("contact_id"), "updated_at")
    // redelivery with different lineage: content-hash dedup absorbs it
    val (raw2, latest2) = persist(spark, p, d, "r2", "2026-01-02T00:00:00Z",
      Seq("contact_id"), "updated_at")
    assert(raw1 == 2 && raw2 == 2, "raw must not grow on redelivery")
    assert(latest1 == 2 && latest2 == 2)
  }

  test("update wins in latest; raw keeps full history") {
    val p = freshPaths()
    persist(spark, p, delta(("1", "old@x", "2024-01-01")), "r1",
      "2026-01-01T00:00:00Z", Seq("contact_id"), "updated_at")
    val (raw, latest) = persist(spark, p,
      delta(("1", "new@x", "2024-02-01")), "r2",
      "2026-01-02T00:00:00Z", Seq("contact_id"), "updated_at")
    assert(raw == 2, "raw keeps both versions")
    assert(latest == 1)
    val email = spark.read.parquet(p.latest).select("email").as[String].head()
    assert(email == "new@x")
  }

  test("partitioned layout: raw/latest hive-partitioned, semantics unchanged") {
    val p = freshPaths()
    val d = delta(("1", "a@x", "2024-01-01"), ("2", "b@x", "2024-02-01"))
      .withColumn("ym", org.apache.spark.sql.functions.substring(
        org.apache.spark.sql.functions.col("updated_at"), 1, 7))
    val (raw, latest) = persist(spark, p, d, "r1", "2026-01-01T00:00:00Z",
      Seq("contact_id"), "updated_at", partitionCols = Seq("ym"))
    assert(raw == 2 && latest == 2)
    // hive layout on disk, partition column restored on read
    val dirs = new java.io.File(p.raw).listFiles().map(_.getName).filter(_.startsWith("ym="))
    assert(dirs.toSet == Set("ym=2024-01", "ym=2024-02"))
    assert(spark.read.parquet(p.raw).columns.contains("ym"))
    // idempotence holds in partitioned form too
    val (raw2, _) = persist(spark, p, d, "r2", "2026-01-02T00:00:00Z",
      Seq("contact_id"), "updated_at", partitionCols = Seq("ym"))
    assert(raw2 == 2)
  }

  test("partitioned idempotence survives type-inferable partition values") {
    // "07" would be re-typed int 7 by partition inference on read-back,
    // changing its hash rendering — the explicit-schema read keeps it
    // a string and re-persisting stays a no-op
    val p = freshPaths()
    val d = delta(("1", "a@x", "2024-01-01"), ("2", "b@x", "2024-02-01"))
      .withColumn("bucket",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("contact_id") === "1", "07").otherwise("11"))
    val (raw1, _) = persist(spark, p, d, "r1", "2026-01-01T00:00:00Z",
      Seq("contact_id"), "updated_at", partitionCols = Seq("bucket"))
    val (raw2, _) = persist(spark, p, d, "r2", "2026-01-02T00:00:00Z",
      Seq("contact_id"), "updated_at", partitionCols = Seq("bucket"))
    assert(raw1 == 2 && raw2 == 2, "redelivery must not grow partitioned raw")
    // consumers of a hive-partitioned lake supply the schema (or
    // disable partitionColumnTypeInference) — an inferred read would
    // re-type "07" as int 7
    val schema = spark.read.parquet(p.raw).schema
    val stringed = org.apache.spark.sql.types.StructType(
      schema.map(f => if (f.name == "bucket")
        f.copy(dataType = org.apache.spark.sql.types.StringType) else f))
    val buckets = spark.read.schema(stringed).parquet(p.raw).select("bucket")
      .as[String].collect().sorted.toSeq
    assert(buckets == Seq("07", "11"), s"leading zero must survive: $buckets")
    // master/latest is built from a re-read of raw — its on-disk dirs
    // must keep the string value too (a bypassed typed read wrote
    // bucket=7 here while raw stayed correct)
    val latestDirs = new java.io.File(p.latest).listFiles()
      .map(_.getName).filter(_.startsWith("bucket=")).sorted.toSeq
    assert(latestDirs == Seq("bucket=07", "bucket=11"),
      s"latest partition dirs re-typed: $latestDirs")
  }

  test("partition-scoped rewrite: untouched partitions byte-identical") {
    import org.apache.spark.sql.functions.{col, when}
    val p = freshPaths()
    // bucket is a pure function of the key (the partitionScoped
    // contract): contacts 1/2 → bucket a, contact 3 → bucket b
    def bucketed(rows: (String, String, String)*) =
      delta(rows: _*).withColumn("bucket",
        when(col("contact_id") <= "2", "a").otherwise("b"))
    persist(spark, p,
      bucketed(("1", "a@x", "2024-01-01"), ("3", "c@x", "2024-01-01")),
      "r1", "2026-01-01T00:00:00Z", Seq("contact_id"), "updated_at",
      partitionCols = Seq("bucket"), partitionScoped = true)

    def fileHashes(dir: String): Map[String, String] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.isFile).filterNot(_.getName.startsWith("."))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
          f.getName -> md.digest(java.nio.file.Files.readAllBytes(f.toPath))
            .map("%02x".format(_)).mkString
        }.toMap
    }
    val beforeA = fileHashes(s"${p.raw}/bucket=a")
    val beforeLatestA = fileHashes(s"${p.latest}/bucket=a")
    assert(beforeA.nonEmpty)

    // second run touches ONLY bucket b; counts are AFFECTED-partition
    // scoped (a lake total would be the O(history) scan the path avoids)
    val (raw2, latest2) = persist(spark, p,
      bucketed(("3", "c2@x", "2024-02-01")),
      "r2", "2026-01-02T00:00:00Z", Seq("contact_id"), "updated_at",
      partitionCols = Seq("bucket"), partitionScoped = true)
    assert(raw2 == 2, "affected raw: both versions of contact 3")
    assert(latest2 == 1, "affected latest: one row for contact 3")
    assert(spark.read.parquet(p.raw).count() == 3, "lake total: 1 + 2 versions")
    assert(fileHashes(s"${p.raw}/bucket=a") == beforeA,
      "bucket a raw files must be physically untouched")
    assert(fileHashes(s"${p.latest}/bucket=a") == beforeLatestA,
      "bucket a latest files must be physically untouched")
    val email = spark.read.parquet(p.latest)
      .filter(col("contact_id") === "3").select("email").as[String].head()
    assert(email == "c2@x")

    // scoped redelivery is still idempotent
    val (raw3, _) = persist(spark, p, bucketed(("3", "c2@x", "2024-02-01")),
      "r3", "2026-01-03T00:00:00Z", Seq("contact_id"), "updated_at",
      partitionCols = Seq("bucket"), partitionScoped = true)
    assert(raw3 == 2, "scoped redelivery must not grow the affected partition")

    // empty delta: idempotent no-op, not an error
    val (raw4, latest4) = persist(spark, p,
      bucketed().selectExpr("contact_id", "email", "updated_at", "bucket"),
      "r4", "2026-01-04T00:00:00Z", Seq("contact_id"), "updated_at",
      partitionCols = Seq("bucket"), partitionScoped = true)
    assert(raw4 == 0 && latest4 == 0)
    assert(spark.read.parquet(p.raw).count() == 3, "empty delta changes nothing")
  }

  test("partition-scoped swap heals a crash between backup and rename") {
    import org.apache.spark.sql.functions.{col, when}
    val p = freshPaths()
    def bucketed(rows: (String, String, String)*) =
      delta(rows: _*).withColumn("bucket",
        when(col("contact_id") <= "2", "a").otherwise("b"))
    persist(spark, p,
      bucketed(("1", "a@x", "2024-01-01"), ("3", "c@x", "2024-01-01")),
      "r1", "2026-01-01T00:00:00Z", Seq("contact_id"), "updated_at",
      partitionCols = Seq("bucket"), partitionScoped = true)

    // simulate a crash mid-swap: bucket a was renamed to the backup
    // but its replacement never arrived — the partition is "missing"
    val rawA = new java.io.File(s"${p.raw}/bucket=a")
    val bak = new java.io.File(s"${p.raw}/__swap_backup/bucket=a")
    bak.getParentFile.mkdirs()
    assert(rawA.renameTo(bak), "test setup: move partition into backup")
    assert(!rawA.exists())

    // next scoped run (touching only bucket b) must first restore a
    val (raw2, _) = persist(spark, p, bucketed(("3", "c2@x", "2024-02-01")),
      "r2", "2026-01-02T00:00:00Z", Seq("contact_id"), "updated_at",
      partitionCols = Seq("bucket"), partitionScoped = true)
    assert(raw2 == 2)
    assert(rawA.exists(), "crashed-out partition must be restored")
    assert(!new java.io.File(s"${p.raw}/__swap_backup").exists(),
      "backup root must be cleared after recovery")
    val contact1 = spark.read.parquet(p.raw)
      .filter(col("contact_id") === "1").count()
    assert(contact1 == 1, "restored partition's history intact")
  }

  test("pending-latest marker heals raw/latest divergence from a crash between swaps") {
    import org.apache.spark.sql.functions.{col, when}
    val p = freshPaths()
    def bucketed(rows: (String, String, String)*) =
      delta(rows: _*).withColumn("bucket",
        when(col("contact_id") <= "2", "a").otherwise("b"))
    persist(spark, p,
      bucketed(("1", "a@x", "2024-01-01"), ("3", "c@x", "2024-01-01")),
      "r1", "2026-01-01T00:00:00Z", Seq("contact_id"), "updated_at",
      partitionCols = Seq("bucket"), partitionScoped = true)

    // simulate a crash AFTER the raw swap, BEFORE the latest swap:
    // raw has bucket b's merged data, latest's copy is gone, and the
    // pending marker (written before the raw swap) records the debt
    val latestB = new java.io.File(s"${p.latest}/bucket=b")
    latestB.listFiles().foreach(_.delete()); latestB.delete()
    assert(!latestB.exists())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p.latest + "__pending"), "bucket=b")

    // next run touches ONLY bucket a — recovery must still rebuild
    // bucket b's latest from current raw before the merge proceeds
    persist(spark, p, bucketed(("1", "a2@x", "2024-02-01")),
      "r2", "2026-01-02T00:00:00Z", Seq("contact_id"), "updated_at",
      partitionCols = Seq("bucket"), partitionScoped = true)
    assert(latestB.exists(), "pending latest partition must be rebuilt")
    assert(!new java.io.File(p.latest + "__pending").exists(),
      "marker cleared once latest is consistent")
    val e3 = spark.read.parquet(p.latest)
      .filter(col("contact_id") === "3").select("email").as[String].head()
    assert(e3 == "c@x", "rebuilt latest reflects raw's content")
    val e1 = spark.read.parquet(p.latest)
      .filter(col("contact_id") === "1").select("email").as[String].head()
    assert(e1 == "a2@x", "the new merge still lands")
  }

  test("delta dirs are preserved per run") {
    val p = freshPaths()
    persist(spark, p, delta(("1", "a@x", "2024-01-01")), "r1",
      "2026-01-01T00:00:00Z", Seq("contact_id"), "updated_at")
    persist(spark, p, delta(("2", "b@x", "2024-01-01")), "r2",
      "2026-01-02T00:00:00Z", Seq("contact_id"), "updated_at")
    assert(spark.read.parquet(p.delta("r1")).count() == 1)
    assert(spark.read.parquet(p.delta("r2")).count() == 1)
    assert(spark.read.parquet(p.raw).count() == 2)
  }
}
