package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Resurrection split, engagement migration, and kNN margin
  * invariants. */
class MigrationMarginSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)
  private def tbl(name: String) =
    graft.pipeline.Tables.t(spark, SparkTesting.sf, name)

  test("resurrection_daily: buckets partition active users per day, first day all-new") {
    import spark.implicits._
    val rows = q("q_resurrection_daily")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val grid = tbl("events")
      .select(col("user_id"),
        expr("div(unix_micros(date_trunc('day', ts)), 86400000000)").as("d"))
      .distinct().groupBy("d").count()
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (d, ret, back, res, first) =>
      assert(ret + back + res + first == grid(d), s"day $d partition")
    }
    val day1 = rows.head
    assert(day1._2 == 0 && day1._3 == 0 && day1._4 == 0,
      "the first day has no history, everyone is first_seen")
    assert(rows.map(_._5).sum ==
      tbl("events").select("user_id").distinct().count(),
      "each user is first_seen exactly once")
  }

  test("engagement_migration: matrix cells partition the user base, bands 0-4") {
    import spark.implicits._
    val rows = q("q_engagement_migration").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b1, b2, n) =>
      assert(b1 >= 0 && b1 <= 4 && b2 >= 0 && b2 <= 4 && n > 0)
      assert(!(b1 == 0 && b2 == 0), "a user absent from both periods cannot exist")
    }
    assert(rows.map(_._3).sum ==
      tbl("events").select("user_id").distinct().count())
  }

  test("knn_margin: top1 strictly >= top2, flag agrees with the gap") {
    import spark.implicits._
    val rows = q("q_knn_margin")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, top1, s1, s2, margin, thin) =>
      assert(qid != top1)
      assert(s1 >= s2, s"query $qid ranking order")
      assert(margin == s1 - s2)
      assert(thin == (if (margin < 10) 1L else 0L))
    }
  }
}
