package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** The testdata's sources are uniform (every boost ≈ 1000 milli), so
  * the oracle gate proves q_mix_temperature's arithmetic but not its
  * POINT — that τ = 1/2 up-weights small sources and down-weights
  * large ones. This fixture is a 9:1 two-source skew: shares 900/100
  * permille → √-weights 750/250 permille, so the small source must
  * boost ~2.5× and the large one shrink to ~0.83×, and the weights
  * must still sum to ~1000. */
class MixTemperatureSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("tau=1/2 rebalances a 9:1 skew toward 3:1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mixtemp").toFile
    dir.deleteOnExit()
    val docs =
      (0L until 900L).map(i => (i, "x" * 100, "big")) ++
      (900L until 1000L).map(i => (i, "x" * 100, "small"))
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/documents.parquet")
    val got = graft.SparkEntry.queries("q_mix_temperature")(spark, dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val Seq(big, small) = got.toSeq
    // shares: 900/100 permille; sqrt(micro-shares): floor(√9e5)=948,
    // floor(√1e5)=316 → weights 948/1264=750, 316/1264=250 permille
    assert(big == (("big", 900L, 750L, 833L)), s"big: $big")
    assert(small == (("small", 100L, 250L, 2500L)), s"small: $small")
    assert(big._3 + small._3 == 1000L)
  }
}
