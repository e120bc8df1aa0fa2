package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

/** Weighted epoch mixing — the ONE definition of the mixture-weight
  * copy count, shared by the batch operator (q_mix_weighted) and the
  * streaming ingest variant (DocStream.mixedStream) so batch and
  * stream mixtures cannot drift.
  *
  * A stratum's weight is expressed in permille epochs (500 = half the
  * docs, 2500 = every doc 2.5 times on average). Whole epochs
  * replicate every doc; the fractional epoch keeps a doc iff a
  * seed-stamped md5 nibble of its id clears the fraction — a pure
  * function of (seed, id), so the mixture reproduces on any engine,
  * any run, any partitioning (the property train/eval splits need,
  * and `rand()` does not have). Everything is a per-row projection +
  * bounded explode: ZERO shuffles, and stateless — safe on an
  * unbounded stream.
  */
object Mixing {

  /** Stable train/val/test assignment (80/10/10) from a seed-stamped
    * md5 byte of the id — the ONE split rule, shared by the
    * registered operator (q_split_assign) and the curation lifecycle
    * (pipeline.Curation) so corpus splits cannot drift between the
    * standalone operator and the composed pipeline. Byte thresholds:
    * 204/256 ≈ 80%, 230/256 ≈ 10%/10%. Pure per-row projection. */
  def splitAssign(seed: String, id: Column): Column = {
    val b = conv(substring(
      md5(concat(lit(s"$seed|"), id.cast(StringType))), 1, 2), 16, 10)
      .cast(IntegerType)
    when(b < 204, "train").when(b < 230, "val").otherwise("test")
  }

  /** Copy count for one row: whole epochs + the hash-decided
    * fractional epoch. Fractions must be expressible in nibble
    * sixteenths (0, 62.5‰, 125‰, …) so the hash decision is exact. */
  def epochCopies(lang: Column, docId: Column, seed: String,
                  weightsPermille: Map[String, Int],
                  defaultPermille: Int): Column = {
    val all = weightsPermille.values.toSeq :+ defaultPermille
    all.foreach { w =>
      require(w >= 0 && (w % 1000) * 16 % 1000 == 0,
        s"weight $w‰: the fractional part must be a multiple of 62.5‰ " +
          "(one md5 nibble sixteenth) for an exact hash decision")
    }
    def pick(f: Int => Int): Column =
      weightsPermille.toSeq.sortBy(_._1).foldRight(lit(f(defaultPermille))) {
        case ((l, w), rest) => when(lang === l, f(w)).otherwise(rest)
      }
    val nib = conv(substring(
      md5(concat(lit(s"$seed|"), docId.cast(StringType))), 1, 1),
      16, 10).cast(IntegerType)
    pick(_ / 1000) + when(pick(w => w % 1000 * 16 / 1000) > nib, 1).otherwise(0)
  }

  /** Adapter between q_domain_reweight's truncating-division output
    * (arbitrary permille) and [[epochCopies]]' exactness contract
    * (fractional part a multiple of 125‰ — the smallest fraction an
    * integer-permille md5-nibble decision resolves exactly): snap to
    * the nearest 125‰ step, half away from zero, never below 0.
    * Pure integer arithmetic, so the quantized mixture is itself
    * engine-reproducible. DomainReweightComposeSpec proves the
    * reweight → quantize → mix loop composes end to end. */
  def quantizeEpochPermille(w: Int): Int = {
    require(w >= 0, s"epoch weight must be nonnegative, got $w")
    (2 * w + 125) / 250 * 125
  }

  /** One output row per epoch copy (`copy_n` = 1..n); docs mixed out
    * (zero copies) disappear. The empty-array guard matters:
    * `sequence(1, 0)` would COUNT DOWN in Spark and emit [1, 0]. */
  def explodeCopies(df: DataFrame, copies: Column): DataFrame =
    df.withColumn("_n_copies", copies)
      .withColumn("copy_n",
        explode(when(col("_n_copies") >= 1,
          sequence(lit(1L), col("_n_copies").cast(LongType)))
          .otherwise(array().cast(ArrayType(LongType)))))
      .drop("_n_copies")
}
