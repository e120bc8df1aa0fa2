package graft.pipeline

import java.nio.file.Files
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** TTL semantics of the dim cache (run_ac_extraction.py:335-384):
  * fresh cache served without a fetch, stale/absent/garbage-stamped
  * cache refetched. The clock is injected — no sleeping. */
class DimCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  private val t0 = Instant.parse("2026-01-01T00:00:00Z")

  test("absent cache fetches once; fresh cache serves without fetching") {
    val root = Files.createTempDirectory("dims").toString
    var fetches = 0
    def fetch() = { fetches += 1; Seq((1L, "A"), (2L, "B")).toDF("id", "name") }

    val d1 = DimCache.loadOrRefreshDim(spark, root, "tags", fetch _, 7, t0)
    assert(fetches == 1 && d1.count() == 2)

    // 6 days later: still inside the 7-day TTL — served from disk
    val d2 = DimCache.loadOrRefreshDim(spark, root, "tags", fetch _, 7,
      t0.plus(java.time.Duration.ofDays(6)))
    assert(fetches == 1, "fresh cache must not refetch")
    assert(d2.as[(Long, String)].collect().toSet == Set((1L, "A"), (2L, "B")))
  }

  test("stale cache refetches and serves the new content") {
    val root = Files.createTempDirectory("dims").toString
    var version = 0
    def fetch() = { version += 1; Seq((1L, s"v$version")).toDF("id", "name") }

    DimCache.loadOrRefreshDim(spark, root, "lists", fetch _, 7, t0)
    // 7 days = TTL boundary: reference refreshes at age >= refresh_days
    val d = DimCache.loadOrRefreshDim(spark, root, "lists", fetch _, 7,
      t0.plus(java.time.Duration.ofDays(7)))
    assert(version == 2, "stale cache must refetch")
    assert(d.select("name").as[String].head() == "v2")
  }

  test("garbage meta stamp forces a refetch, never counts as fresh") {
    val root = Files.createTempDirectory("dims").toString
    var fetches = 0
    def fetch() = { fetches += 1; Seq((1L, "A")).toDF("id", "name") }

    DimCache.loadOrRefreshDim(spark, root, "deals", fetch _, 7, t0)
    Files.writeString(java.nio.file.Paths.get(root, "deals.meta.json"),
      """{"fetched_at_utc": "not-a-timestamp"}""")
    DimCache.loadOrRefreshDim(spark, root, "deals", fetch _, 7, t0)
    assert(fetches == 2, "unparseable stamp must be treated as stale")
  }

  test("missing-resource dim: an empty fetch result is cached as empty") {
    val root = Files.createTempDirectory("dims").toString
    var fetches = 0
    def fetch() = {
      fetches += 1
      spark.emptyDataset[(Long, String)].toDF("id", "name")
    }
    val d1 = DimCache.loadOrRefreshDim(spark, root, "scores", fetch _, 7, t0)
    val d2 = DimCache.loadOrRefreshDim(spark, root, "scores", fetch _, 7,
      t0.plusSeconds(60))
    assert(d1.count() == 0 && d2.count() == 0)
    assert(fetches == 1, "the empty result must be served from cache")
  }
}
