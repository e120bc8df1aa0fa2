package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input event for the digest: pre-rendered timestamp (sortable
  * string), unique id tiebreak, the event type, and the display
  * line. */
final case class DigestEvent(ets: String, event_id: Long,
                             event_type: String, line: String)

/** Bounded aggregation buffer: distinct event types (dim-sized) and
  * the last `k` events in chronological order. */
final case class DigestBuf(types: Seq[String], lastK: Seq[DigestEvent])

/** Finished digest: ", "-joined sorted distinct types and the last-k
  * lines newline-joined in chronological order. */
final case class DigestOut(types: String, tail: String)

/** A9 — per-contact digest rollup as a typed `Aggregator`
  * (run_ac_extraction.py:1436-1506): sorted distinct type set plus
  * the last `k` event lines.
  *
  * Why a custom Aggregator (SURVEY.md §2.10 — the one justified
  * UDAF): the compositional form
  * `slice(array_sort(collect_list(struct(...))), -k, k)` buffers
  * EVERY event of a contact in the aggregation state before slicing —
  * at 100 TB a hot contact's full history sits in one task's memory.
  * This Aggregator's state is O(k + |types|): `reduce` keeps a
  * bounded k-buffer, so partial (map-side) aggregation shrinks data
  * before the shuffle and skewed contacts cannot blow up state.
  */
final class DigestAgg(k: Int) extends Aggregator[DigestEvent, DigestBuf, DigestOut] {

  override def zero: DigestBuf = DigestBuf(Vector.empty, Vector.empty)

  /** Keep the buffer sorted by (ets, event_id) and bounded to the
    * greatest k elements — the "last" k chronologically. */
  private def bounded(events: Seq[DigestEvent]): Seq[DigestEvent] = {
    val sorted = events.sortBy(x => (x.ets, x.event_id))
    if (sorted.size > k) sorted.takeRight(k) else sorted
  }

  override def reduce(b: DigestBuf, e: DigestEvent): DigestBuf =
    DigestBuf(
      if (b.types.contains(e.event_type)) b.types else b.types :+ e.event_type,
      bounded(b.lastK :+ e))

  override def merge(a: DigestBuf, b: DigestBuf): DigestBuf =
    DigestBuf((a.types ++ b.types).distinct, bounded(a.lastK ++ b.lastK))

  override def finish(r: DigestBuf): DigestOut =
    DigestOut(r.types.sorted.mkString(", "), r.lastK.map(_.line).mkString("\n"))

  override def bufferEncoder: Encoder[DigestBuf] = Encoders.product[DigestBuf]
  override def outputEncoder: Encoder[DigestOut] = Encoders.product[DigestOut]
}
