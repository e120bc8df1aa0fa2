package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter semi-join prefilter (the runtime-filter
  * pattern: at 100 TB the win of a big-fact ⋈ selective-dim join is
  * decided BEFORE the shuffle — rows that cannot match must die in
  * the scan stage, not travel the wire to be dropped by the join).
  *
  * Build side is deliberately NOT a custom aggregate: k probe
  * positions per key explode inside the dim scan and the bitset
  * assembles as `groupBy(pos / 64) → bit_or(1L << pos % 64)` — a
  * plain hash aggregate, so partial (map-side) combine gives the
  * distributed OR-merge a Bloom build needs for free, and the
  * result is ≤ nbits/64 rows collected to a bounded driver literal
  * (same discipline as the IVF centroid / PQ codebook collects in
  * [[graft.sim.Similarity]]: driver state is sized by a CONFIG, not
  * by data).
  *
  * Probe side is the hot path — every fact row — so it is a native
  * codegen expression ([[BloomMightContain]]), not a UDF: the
  * generated code is two XXH64 calls and k bit tests against a
  * `long[]` shipped once per task as a codegen reference object.
  *
  * Hashing: h1 = xxhash64(key) with Spark's SQL seed 42, h2 =
  * xxhash64(h1) (re-hash, same seed), probe i at
  * (h1 mod nbits + i·(h2 mod nbits)) mod nbits — the standard
  * Kirsch–Mitzenmacher double-hashing scheme with each hash reduced
  * first (ANSI-safe, no wraparound), and h1/h2 are EXACTLY what the SQL
  * `xxhash64` builtin computes, so build (declarative SQL) and probe
  * (native expression) can never disagree on a bit position.
  *
  * False positives are expected and SAFE by contract: callers follow
  * the prefilter with the exact join (see q_bloom_semijoin), so the
  * Bloom changes the plan's traffic, never its answer. False
  * negatives are impossible (spec-pinned in BloomFilterSpec).
  */
object Bloom {

  /** Probe count; with nbits ≈ 16 bits/key this lands near the
    * optimal k = nbits/n·ln2 ≈ 11, rounded down for probe cost. */
  val K = 6

  // (h1 + i·h2) mod nbits, computed with each hash reduced mod nbits
  // FIRST: keeps every intermediate far inside a long under ANSI
  // arithmetic (no wraparound — which would also break the
  // congruence, since nbits is not a power of two), and the probe
  // expression mirrors the same reduction order exactly.
  private def positions(h1: Column, i: Int, nbits: Long): Column = {
    val h2 = xxhash64(h1)
    pmod(pmod(h1, lit(nbits)) + lit(i.toLong) * pmod(h2, lit(nbits)), lit(nbits))
  }

  /** Build the bitset over `dim`'s `key` column (any type xxhash64
    * accepts). `nbits` is rounded up to a multiple of 64. One narrow
    * dim aggregate; the collect is ≤ nbits/64 longs. */
  def buildBits(dim: DataFrame, key: Column, nbits0: Long): Array[Long] = {
    val nbits = ((nbits0 + 63) / 64) * 64
    val nblocks = (nbits / 64).toInt
    val h1 = dim.select(xxhash64(key).as("h1"))
    val pos = h1.select(explode(array((0 until K).map(i =>
      positions(col("h1"), i, nbits)): _*)).as("pos"))
    val blocks = pos
      .groupBy((col("pos") / 64).cast("long").as("block"))
      .agg(bit_or(expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))")).as("bits"))
      .collect()
    val out = new Array[Long](nblocks)
    blocks.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Probe column: true iff `key` MAY be in the set the bits encode.
    * `key` must be LongType (the id-join case this engine uses it
    * for); extend with more input types as call sites appear. */
  def mightContain(bits: Array[Long], key: Column): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(key), bits, K))

  /** Hash pair shared by interpreted eval and the spec (codegen
    * inlines the same calls). Seed 42 = Spark SQL xxhash64's. */
  private[functions] def h1h2(value: Long): (Long, Long) = {
    val h1 = XXH64.hashLong(value, 42L)
    (h1, XXH64.hashLong(h1, 42L))
  }
}

/** `might_contain(bits, key)` as a native unary expression over a
  * LongType key — see [[Bloom]] for the scheme. Never null-produces
  * beyond its child (a null key is null, matching SQL semantics of
  * a null join key never matching). */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {

  private val nbits: Long = bits.length.toLong * 64

  override def prettyName: String = "bloom_might_contain"
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects bigint, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val (h1, h2) = Bloom.h1h2(v.asInstanceOf[Long])
    val m1 = java.lang.Math.floorMod(h1, nbits)
    val m2 = java.lang.Math.floorMod(h2, nbits)
    var i = 0
    while (i < k) {
      val pos = (m1 + i * m2) % nbits
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
      val h1 = ctx.freshName("h1")
      val m1 = ctx.freshName("m1")
      val m2 = ctx.freshName("m2")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |final long $h1 = $xxh.hashLong($v, 42L);
         |final long $m1 = java.lang.Math.floorMod($h1, ${nbits}L);
         |final long $m2 = java.lang.Math.floorMod($xxh.hashLong($h1, 42L), ${nbits}L);
         |boolean $hit = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  final long $pos = ($m1 + $i * $m2) % ${nbits}L;
         |  if (($bitsRef[(int) ($pos >>> 6)] & (1L << ($pos & 63))) == 0L) {
         |    $hit = false; break;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
