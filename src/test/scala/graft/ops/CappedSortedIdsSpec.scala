package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

class CappedSortedIdsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  private def agg(rows: Seq[(String, Long)], cap: Int, parts: Int) =
    rows.toDF("g", "id").repartition(parts)
      .groupBy("g").agg(CappedSortedIds.collect(col("id"), cap).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1)))
      .toMap

  test("collects sorted; NULL strictly past the cap; boundary is inclusive") {
    val rows = (1L to 5L).map("at" -> _) ++
      (1L to 6L).map("over" -> _) ++ Seq("one" -> 9L)
    val got = agg(rows, cap = 5, parts = 1)
    assert(got("at").contains(1L to 5L))
    assert(got("over").isEmpty, "cap+1 members must yield NULL")
    assert(got("one").contains(Seq(9L)))
  }

  test("partial buffers stay capped across a multi-partition merge (serialize path)") {
    // 1000 members spread over 32 partitions: every map-side partial
    // and the merged reduce buffer hold <= cap+1 items, and the group
    // still correctly reports overflow via its running count
    val rows = (1L to 1000L).map("mega" -> _) ++ (1L to 7L).map("ok" -> _)
    val got = agg(rows, cap = 8, parts = 32)
    assert(got("mega").isEmpty)
    assert(got("ok").contains(1L to 7L), "order restored after shuffled merges")
  }

  test("string ids sort like array_sort; nulls are skipped not counted") {
    val df = Seq(("g", "b"), ("g", "a"), ("g", null), ("g", "c"))
      .toDF("g", "id").repartition(3)
    val got = df.groupBy("g")
      .agg(CappedSortedIds.collect(col("id"), 3).as("ids"))
      .select("ids").as[Seq[String]].head()
    assert(got == Seq("a", "b", "c"),
      "3 non-null values fit cap=3 only if the null was not counted")
  }

  test("matches the collect_list compositional form under the cap") {
    val rows = for (g <- 1 to 20; i <- 1 to (g % 7) + 1)
      yield (s"g$g", g * 100L + i)
    val df = rows.toDF("g", "id").repartition(8)
    val viaCap = df.groupBy("g")
      .agg(CappedSortedIds.collect(col("id"), 100).as("ids"))
    val viaList = df.groupBy("g").agg(array_sort(collect_list("id")).as("ids"))
    assert(viaCap.exceptAll(viaList).isEmpty && viaList.exceptAll(viaCap).isEmpty)
  }
}
