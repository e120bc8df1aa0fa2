package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Forecast bake-off and sequential-peeking invariants. */
class BakeoffPeekSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, SparkTesting.sf)

  test("forecast_bakeoff: 5-day horizon, winner is the MAE argmin") {
    import spark.implicits._
    val rows = q("q_forecast_bakeoff")
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, h, mn, ms, md, winner) =>
      assert(h == 5, s"$et horizon")
      val best = Seq("naive" -> mn, "seasonal_naive" -> ms, "drift" -> md)
        .minBy(_._2)._2
      val wMae = winner match {
        case "naive" => mn; case "seasonal_naive" => ms; case _ => md
      }
      assert(wMae == best, s"$et winner $winner")
    }
  }

  test("sequential_peeking: monotone cumulative counts, crossings match the boundary") {
    import spark.implicits._
    val rows = q("q_sequential_peeking")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((_, n0a, n1a, _, _), (_, n0b, n1b, _, _)) =>
        assert(n0b >= n0a && n1b >= n1a, "cumulative counts never shrink")
      case _ =>
    }
    rows.foreach { case (d, _, _, z, crossed) =>
      assert(crossed == (if (math.abs(z) >= 2290) 1L else 0L), s"day $d")
      assert(math.abs(z) < 10000, s"day $d |z| sane for a null effect")
    }
  }
}
