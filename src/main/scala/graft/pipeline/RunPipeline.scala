package graft.pipeline

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
  def main(args: Array[String]): Unit = {
    val outRoot = args(0)
    val totalRows = if (args.length > 1) args(1) else "300"
    val spark = Sessions.local("graft-run-pipeline")
    spark.sparkContext.setLogLevel("WARN")

    val statePath = s"$outRoot/state.json"
    val state = Watermark.load(statePath)
    println(s"[pipeline] watermark in: max_id=${state.maxId}")

    val contacts = spark.read.format("graft.sources.PagedSource")
      .option("totalrows", totalRows).option("pagelimit", "100").load()
    val slice = Watermark.incrementalSlice(contacts, "id", state)
    val sliceCount = slice.count()
    println(s"[pipeline] incremental slice rows=$sliceCount")

    val runId = s"run_after_${state.maxId}"
    val (rawN, latestN) = PersistTableDual.persist(
      spark, PersistTableDual.Paths(outRoot, "contacts"),
      slice.withColumn("contact_id", col("id").cast("string")),
      runId, "2026-01-01T00:00:00Z", Seq("contact_id"), "updated_at")
    println(s"[pipeline] master/raw rows=$rawN master/latest rows=$latestN")

    val advanced = Watermark.advance(slice, "id", state, "2026-01-01T00:00:00Z")
    Watermark.save(statePath, advanced)
    println(s"[pipeline] watermark out: max_id=${advanced.maxId}")
    spark.stop()
  }
}
