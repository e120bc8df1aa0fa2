package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths => JPaths}

/** Keyset-watermark state (E1 steps 2/9: run_ac_extraction.py
  * :1556-1571, 1696-1700) — `state.json` holding the max processed id
  * plus the last-run stamp, read at plan time and advanced after a
  * successful batch.
  *
  * In streaming mode this role is played by the checkpoint/offset log
  * (graft.streaming); in batch it is a tiny driver-side JSON file —
  * state is O(1), never data-sized.
  */
object Watermark {

  final case class State(maxId: Long, lastRunUtc: String)

  private val IdRe = """"max_id"\s*:\s*(-?\d+)""".r
  private val TsRe = """"last_run_utc"\s*:\s*"([^"]*)"""".r

  def load(path: String): State = {
    val p = JPaths.get(path)
    if (!Files.exists(p)) State(-1L, "")
    else {
      val s = Files.readString(p)
      State(
        IdRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(-1L),
        TsRe.findFirstMatchIn(s).map(_.group(1)).getOrElse(""))
    }
  }

  def save(path: String, state: State): Unit = {
    val p = JPaths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p,
      s"""{"max_id": ${state.maxId}, "last_run_utc": "${state.lastRunUtc}"}""")
  }

  /** S5: the incremental slice past the watermark. The comparison is
    * pushed into the scan (PushedFilters on parquet; offset predicate
    * on a keyset-capable source). */
  def incrementalSlice(df: DataFrame, idCol: String, state: State): DataFrame =
    df.filter(col(idCol) > state.maxId)

  /** A7: advance to the batch max (no-op on an empty batch). */
  def advance(df: DataFrame, idCol: String, prev: State, runUtc: String): State = {
    val m = df.agg(max(col(idCol))).head()
    val newMax = if (m.isNullAt(0)) prev.maxId
                 else math.max(prev.maxId, m.getLong(0))
    State(newMax, runUtc)
  }
}
