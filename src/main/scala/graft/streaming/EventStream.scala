package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming surface (SURVEY.md §2.9): the reference's
  * cron-micro-batch semantics mapped onto real streaming operators.
  *
  *  - watermark/offset state → checkpoint + `withWatermark`
  *  - content-hash dedup of redelivered rows → `dropDuplicates`
  *    bounded by the event-time watermark
  *  - per-run delta output → `foreachBatch` writing batchId-keyed dirs
  *  - (beyond the reference) tumbling-window aggregation — the
  *    driver's north star for the streaming surface.
  *
  * All transforms take/return DataFrames so the same plan fragments
  * run in batch tests and streaming (the batch analogs in
  * CoreQueries are oracle-checked; these are exercised via
  * MemoryStream in EventStreamSpec).
  */
object EventStream {

  /** Tumbling-window counts/sums per event_type. `value` is
    * canonicalized to DECIMAL so batch/streaming/oracle agree. */
  def tumblingCounts(events: DataFrame, windowLen: String,
                     watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** At-least-once input → exactly-once effect: drop redelivered
    * rows by id, state bounded by the watermark (the streaming form
    * of the reference's content-hash merge dedup). */
  def dedupByIdWithWatermark(events: DataFrame, watermarkDelay: String): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-micro-batch delta sink: each batch writes its own
    * batchId-keyed dir (the reference's runs/<run_id>/delta layout,
    * run_ac_extraction.py:156-157). */
  def deltaSink(events: DataFrame, outRoot: String,
                checkpoint: String): DataStreamWriter[Row] =
    events.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outRoot/batch_$batchId")
      }
}
