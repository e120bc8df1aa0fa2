package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary buffer: at most `k` tracked
  * tokens with residual counts. */
final case class MGBuf(toks: Map[String, Long])

/** Misra-Gries frequent-items sketch as a typed `Aggregator`
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): bounded O(k) state per group, one pass.
  *
  * Guarantee: for every token, trueCount − estimate ≤ N/(k+1) where
  * N is the group's stream length — so any token with frequency
  * above N/(k+1) is PRESENT in the final candidate set. The merge
  * (pairwise count sum, then subtract the (k+1)-th largest residual)
  * preserves the same bound, which is what makes the sketch safe as
  * a map-side partial aggregate: at 100 TB the full token→count map
  * per source never materializes, only ≤k residuals per partition
  * cross the shuffle.
  *
  * Consumers that need EXACT heavy hitters (q_heavy_hitters_gate)
  * use the sketch as a candidate filter and re-count only the ≤k
  * survivors exactly — the sketch's one-sided error means no true
  * heavy hitter is lost, and the exact second pass discards false
  * positives.
  */
final class MisraGriesAgg(k: Int) extends Aggregator[String, MGBuf, Seq[String]] {

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(b: MGBuf, tok: String): MGBuf = {
    val m = b.toks
    m.get(tok) match {
      case Some(c) => MGBuf(m.updated(tok, c + 1L))
      case None if m.size < k => MGBuf(m.updated(tok, 1L))
      case None =>
        // decrement-all step: every tracked count −1, drop zeros
        MGBuf(m.collect { case (t, c) if c > 1L => t -> (c - 1L) })
    }
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    if (a.toks.isEmpty) return b
    if (b.toks.isEmpty) return a
    val comb = (a.toks.keySet ++ b.toks.keySet).iterator
      .map(t => t -> (a.toks.getOrElse(t, 0L) + b.toks.getOrElse(t, 0L)))
      .toMap
    if (comb.size <= k) MGBuf(comb)
    else {
      // subtract the (k+1)-th largest count from all, keep positives
      val d = comb.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      MGBuf(comb.collect { case (t, c) if c - d > 0L => t -> (c - d) })
    }
  }

  override def finish(r: MGBuf): Seq[String] = r.toks.keys.toSeq.sorted

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
