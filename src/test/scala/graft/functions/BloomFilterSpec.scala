package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Contract checks for the Bloom semi-join prefilter: zero false
  * negatives (the correctness half), a bounded false-positive rate
  * (the usefulness half), build/probe hash agreement, and the plan
  * shape of q_bloom_semijoin — prefilter inside the fact scan stage,
  * exact join still present.
  */
class BloomFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 37 + 11)
    val dim = keys.toDF("k")
    val bits = Bloom.buildBits(dim, col("k"), 16L * keys.length)
    val missed = dim.filter(!Bloom.mightContain(bits, col("k"))).count()
    assert(missed == 0L, s"$missed inserted keys probed false")
  }

  test("false-positive rate near the 16-bits/key design point") {
    import spark.implicits._
    val keys = (0L until 5000L).map(i => i * 37 + 11)
    val bits = Bloom.buildBits(keys.toDF("k"), col("k"), 16L * keys.length)
    // disjoint probe set (odd offsets never collide with 37i+11 mod 2... use shifted range)
    val probes = (1000000L until 1050000L).toDF("k")
    val fp = probes.filter(Bloom.mightContain(bits, col("k"))).count()
    val rate = fp.toDouble / 50000
    // design FPP ≈ 0.5%; allow generous slack, fail on an order-of-
    // magnitude break (hash misagreement shows up as ~100% here)
    assert(rate < 0.05, s"false-positive rate $rate")
  }

  test("interpreted eval matches codegen path") {
    import spark.implicits._
    val keys = (0L until 200L).map(i => i * 97 + 3)
    val bits = Bloom.buildBits(keys.toDF("k"), col("k"), 16L * keys.length)
    val probes = (0L until 2000L).toDF("k")
    val viaExpr = probes.filter(Bloom.mightContain(bits, col("k")))
      .as[Long].collect().toSet
    val viaEval = (0L until 2000L).filter { v =>
      BloomMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(v),
        bits, Bloom.K).eval(null).asInstanceOf[Boolean]
    }.toSet
    assert(viaExpr == viaEval)
    assert(keys.filter(_ < 2000L).toSet.subsetOf(viaExpr))
  }

  test("q_bloom_semijoin: prefilter prunes before the exact join, result exact") {
    val df = graft.SparkEntry.queries("q_bloom_semijoin")(spark, SparkTesting.sf)
    df.collect()
    val plan = SparkTesting.finalSection(df.queryExecution.executedPlan.toString)
    assert(plan.contains("bloom_might_contain"), s"prefilter missing:\n$plan")
    assert(plan.contains("LeftSemi"), s"exact semi-join missing:\n$plan")
    // the prefilter must sit in the lineitem scan stage: the Filter
    // carrying it reads directly above the parquet scan, meaning
    // pruned rows never reach the join's exchange
    val li = plan.linesIterator.toSeq
    val probeIdx = li.indexWhere(_.contains("bloom_might_contain"))
    val scanIdx = li.indexWhere(l => l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(probeIdx >= 0 && scanIdx > probeIdx,
      s"bloom filter not fused into the fact scan stage:\n$plan")
  }
}
