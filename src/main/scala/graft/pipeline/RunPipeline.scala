package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Sessions

/** E1 `run_pipeline` (run_ac_extraction.py:1537-1703) — the full run
  * lifecycle wired end-to-end on the fixture-backed paged source:
  *
  *   1. load keyset watermark state            (:1557-1559)
  *   2. incremental scan past the watermark    (S5, :1570-1573 —
  *      pushed into the DSv2 source as a planning-time page prune)
  *   3. persist_table_dual merge               (E2, :134-188)
  *   4. advance + save watermark               (:1696-1700)
  *
  * Re-running is a no-op: the watermark skips processed ids and the
  * content-hash dedup absorbs any redelivery — the reference's two
  * idempotence mechanisms, composed.
  *
  * Usage: runMain graft.pipeline.RunPipeline <outRoot> [totalRows]
  */
object RunPipeline {

  /** One incremental run. Returns (sliceRows, rawRows, latestRows). */
  def runOnce(spark: SparkSession, outRoot: String,
              totalRows: Long): (Long, Long, Long) = {
    val statePath = s"$outRoot/state.json"
    val state = Watermark.load(statePath)

    val contacts = spark.read.format("graft.sources.PagedSource")
      .option("totalrows", totalRows.toString).option("pagelimit", "100").load()
    val slice = Watermark.incrementalSlice(contacts, "id", state)

    val runId = s"run_after_${state.maxId}"
    val paths = PersistTableDual.Paths(outRoot, "contacts")
    val (rawN, latestN) = PersistTableDual.persist(
      spark, paths,
      slice.withColumn("contact_id", col("id").cast("string")),
      runId, "2026-01-01T00:00:00Z", Seq("contact_id"), "updated_at")

    // Advance from the delta that was durably WRITTEN, never from a
    // re-scan of the live source: upstream may have grown between the
    // persist and now, and a watermark past unpersisted ids would
    // skip those rows forever.
    val deltaOnDisk = spark.read.parquet(paths.delta(runId))
    val sliceCount = deltaOnDisk.count()
    val advanced = Watermark.advance(deltaOnDisk, "id", state, "2026-01-01T00:00:00Z")
    Watermark.save(statePath, advanced)
    (sliceCount, rawN, latestN)
  }

  def main(args: Array[String]): Unit = {
    val outRoot = args(0)
    val totalRows = if (args.length > 1) args(1).toLong else 300L
    val spark = Sessions.local("graft-run-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    val before = Watermark.load(s"$outRoot/state.json").maxId
    val (sliceN, rawN, latestN) = runOnce(spark, outRoot, totalRows)
    val after = Watermark.load(s"$outRoot/state.json").maxId
    println(s"[pipeline] watermark $before -> $after; slice=$sliceN " +
      s"master/raw=$rawN master/latest=$latestN")
    spark.stop()
  }
}
