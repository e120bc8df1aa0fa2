package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.ops.Ops._

/** SURVEY.md §5.4 property tests: the reference's core invariants
  * under randomized inputs. */
class OpsPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val rowGen: Gen[(String, String, String)] = for {
    k <- Gen.chooseNum(1, 5)
    v <- Gen.oneOf("a", "b", "c", "")
    r <- Gen.oneOf("r1", "r2", "r3")
  } yield (k.toString, v, r)

  private val rowsGen: Gen[List[(String, String, String)]] =
    Gen.listOfN(12, rowGen)

  test("dedup idempotence: merge(merge(x)) == merge(x)") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v", "run_id")
      val once = contentHashDedup(df, Seq("run_id"), col("run_id"))
      val twice = contentHashDedup(once, Seq("run_id"), col("run_id"))
      val a = once.collect().map(_.toString).sorted.toSeq
      val b = twice.collect().map(_.toString).sorted.toSeq
      a == b
    })
  }

  test("dedup result is the distinct content set (lineage ignored)") {
    check(Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v", "run_id")
      val got = contentHashDedup(df, Seq("run_id"), col("run_id"))
        .select("k", "v").collect().map(r => (r.getString(0), r.getString(1)))
        .sorted.toSeq
      val expected = rows.map(r => (r._1, r._2)).distinct.sorted
      got == expected
    })
  }

  test("latestSnapshot = per-key argmax by (ts desc, tiebreak desc)") {
    val tsGen = Gen.listOfN(12, for {
      k <- Gen.chooseNum(1, 4)
      ts <- Gen.chooseNum(1, 9)
      tb <- Gen.chooseNum(1, 9)
      v <- Gen.alphaLowerStr.map(_.take(3))
    } yield (k.toString, f"2024-01-0$ts", tb.toString, v))
    check(Prop.forAll(tsGen) { rows =>
      val df = rows.toDF("k", "ts", "tb", "v")
      val got = latestSnapshot(df, Seq("k"), col("ts"), col("tb"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      val expected = rows.groupBy(_._1).map { case (k, g) =>
        val w = g.maxBy(r => (r._2, r._3))
        (k, w._2, w._3)
      }.toSeq.sortBy(_._1)
      got == expected
    })
  }

  test("alignUnion: column union, null-filled, count additive") {
    val gen = for {
      n1 <- Gen.chooseNum(0, 6)
      n2 <- Gen.chooseNum(0, 6)
    } yield (n1, n2)
    check(Prop.forAll(gen) { case (n1, n2) =>
      val a = (1 to n1).map(i => (i.toString, s"a$i")).toDF("k", "only_a")
      val b = (1 to n2).map(i => (i.toString, s"b$i")).toDF("k", "only_b")
      val u = alignUnion(a, b)
      u.columns.toSet == Set("k", "only_a", "only_b") &&
        u.count() == (n1 + n2).toLong &&
        u.filter(col("only_b").isNull).count() == n1.toLong &&
        u.filter(col("only_a").isNull).count() == n2.toLong
    })
  }
}
