package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkTesting}

/** Proves the DoReMi-style loop COMPOSES: q_domain_reweight's output
  * is, as its QDef comment promises, a weight table q_mix_weighted's
  * machinery (graft.text.Mixing) can consume for the next epoch —
  * reweight → quantize to the hash-exact 125‰ grid → epochCopies →
  * explodeCopies — with the realized per-source copy counts checked
  * against an INDEPENDENT test-local md5-nibble reimplementation
  * (java.security.MessageDigest, not Spark's md5), so the whole
  * chain's determinism is witnessed outside the engine. */
class DomainReweightComposeSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("reweight output is a valid next-epoch mixture table") {
    val w = SparkEntry.queries("q_domain_reweight")(spark, SparkTesting.sf)
      .select("source", "new_weight_permille").collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(w.size === 20, s"expected the 20 testdata sources, got ${w.size}")
    assert(w.values.forall(_ > 0),
      s"the 1-permille floor must keep every source alive: $w")
    val sum = w.values.sum
    // renormalization is truncating division: sum lands in
    // (1000 - |sources|, 1000]
    assert(sum <= 1000 && sum > 1000 - w.size,
      s"weight sum $sum outside the truncation band")
  }

  test("quantizeEpochPermille snaps to the 125-permille grid, half up") {
    assert(Mixing.quantizeEpochPermille(0) === 0)
    assert(Mixing.quantizeEpochPermille(62) === 0)
    assert(Mixing.quantizeEpochPermille(63) === 125)
    assert(Mixing.quantizeEpochPermille(1000) === 1000)
    assert(Mixing.quantizeEpochPermille(1062) === 1000)
    assert(Mixing.quantizeEpochPermille(1063) === 1125)
    assert(Mixing.quantizeEpochPermille(2500) === 2500)
    // every output satisfies epochCopies' exactness require
    (0 to 3000 by 7).foreach { x =>
      val q = Mixing.quantizeEpochPermille(x)
      assert((q % 1000) * 16 % 1000 === 0, s"$x -> $q not nibble-exact")
    }
  }

  test("reweight -> quantize -> mix composes; realized copies match an " +
      "independent md5-nibble reference per source") {
    val weights = SparkEntry.queries("q_domain_reweight")(spark, SparkTesting.sf)
      .select("source", "new_weight_permille").collect()
      .map(r => r.getString(0) -> Mixing.quantizeEpochPermille(r.getLong(1).toInt))
      .toMap
    val docs = graft.pipeline.Tables.t(spark, SparkTesting.sf, "documents")
      .select("doc_id", "source")
    val mixed = Mixing.explodeCopies(docs,
      Mixing.epochCopies(col("source"), col("doc_id"), "epoch2", weights, 1000))
    val got = mixed.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent reference: same (seed, id) nibble rule, JDK digest
    val md = java.security.MessageDigest.getInstance("MD5")
    def nibble(id: Long): Int = {
      val h = md.digest(s"epoch2|$id".getBytes("UTF-8"))
      (h(0) & 0xF0) >>> 4
    }
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2)
      .map { case (src, rows) =>
        val w = weights(src)
        src -> rows.map { case (id, _) =>
          w / 1000 + (if (w % 1000 * 16 / 1000 > nibble(id)) 1 else 0)
        }.map(_.toLong).sum
      }
    weights.keys.foreach { src =>
      assert(got.getOrElse(src, 0L) === want(src),
        s"source $src: engine=${got.getOrElse(src, 0L)} ref=${want(src)} " +
          s"(weight ${weights(src)})")
    }
  }
}
