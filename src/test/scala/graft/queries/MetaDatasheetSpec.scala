package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Meta-analysis and datasheet invariants. */
class MetaDatasheetSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("meta_pooled_slope: pooled estimate, Q and I2 in legal ranges") {
    import spark.implicits._
    val Array((k, pooled, qStat, i2)) =
      q("q_meta_pooled_slope").as[(Long, Long, Long, Long)].collect()
    assert(k >= 2, "several nations pool")
    assert(qStat >= 0)
    assert(i2 >= 0 && i2 < 1000000)
    // pooled is a weighted average so it lies within the stratum hull —
    // weak but engine-independent: it is a finite micro value
    assert(math.abs(pooled) < 100000000L)
  }

  test("dataset_datasheet: counts line up with the corpus") {
    import spark.implicits._
    val Array((nDocs, nTok, nLangs, nSrc, meanChars, enShare, dupPpm)) =
      q("q_dataset_datasheet")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(nDocs == tbl("documents").count())
    assert(nLangs == tbl("documents").select("lang").distinct().count())
    assert(nSrc == tbl("documents").select("source").distinct().count())
    val totTok = tbl("documents")
      .select(size(graft.text.TextAnalysis.tokens(col("text"))).cast("long"))
      .as[Long].collect().sum
    assert(nTok == totTok)
    assert(enShare > 0 && enShare < 1000000)
    assert(dupPpm >= 0 && dupPpm < 1000000)
    assert(meanChars > 0)
  }
}
