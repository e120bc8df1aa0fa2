package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.ops.Ops._

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  private def mk(rows: (String, String, String)*) =
    rows.toDF("k", "v", "run_id")

  test("contentHashDedup: duplicates collapse, min tiebreak wins, idempotent") {
    val df = mk(("1", "a", "r1"), ("1", "a", "r2"), ("1", "b", "r1"), ("2", "a", "r1"))
    val once = contentHashDedup(df, Seq("run_id"), col("run_id"))
    assert(once.count() == 3) // (1,a) collapses; (1,b) and (2,a) kept
    // the surviving (1,a) row carries r1 (min run_id)
    val kept = once.filter($"k" === "1" && $"v" === "a").select("run_id").as[String].head()
    assert(kept == "r1")
    // idempotence: dedup(dedup(x)) == dedup(x)
    val twice = contentHashDedup(once, Seq("run_id"), col("run_id"))
    assert(twice.count() == once.count())
  }

  test("contentHashDedup is insensitive to lineage-only differences") {
    val df = mk(("1", "a", "r1"), ("1", "a", "r9"))
    assert(contentHashDedup(df, Seq("run_id"), col("run_id")).count() == 1)
  }

  test("latestSnapshot = argmax by (ts, tiebreak) per key") {
    val df = Seq(
      ("k1", "2024-01-01", "x", 1), ("k1", "2024-01-03", "y", 1),
      ("k1", "2024-01-03", "z", 2), ("k2", "2024-01-01", "w", 1))
      .toDF("k", "ts", "v", "tb")
    val got = latestSnapshot(df, Seq("k"), col("ts"), col("tb"))
      .orderBy("k").select("v").as[String].collect()
    assert(got.toSeq == Seq("z", "w")) // ties broken by tb desc
  }

  test("topNPerGroup keeps exactly N most-recent per key") {
    val df = (1 to 10).map(i => ("k", f"2024-01-$i%02d", i)).toDF("k", "ts", "i")
    val got = topNPerGroup(df, Seq("k"), Seq(col("ts").desc, col("i").desc), 3)
      .select("i").as[Int].collect().sorted
    assert(got.toSeq == Seq(8, 9, 10))
  }

  test("alignUnion aligns by name with nulls for missing columns") {
    val a = Seq((1, "x")).toDF("id", "a_only")
    val b = Seq((2, "y")).toDF("id", "b_only")
    val u = alignUnion(a, b).orderBy("id")
    assert(u.columns.toSeq == Seq("id", "a_only", "b_only"))
    val rows = u.collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "y")
  }

  test("mapLookup: broadcast left join keeps unmatched facts with null name") {
    val fact = Seq((1, 10), (2, 99)).toDF("fid", "dim_id")
    val dim = Seq((10, "ten")).toDF("id", "name")
    val got = mapLookup(fact, dim, col("dim_id"), "id", "name", "dim_name")
      .orderBy("fid").select("dim_name").collect()
    assert(got(0).getString(0) == "ten" && got(1).isNullAt(0))
  }

  test("fallbackChain: blank-aware coalesce") {
    val df = Seq(("", "fb"), ("nan", "fb"), ("v", "fb")).toDF("p", "f")
    val got = df.select(fallbackChain($"p", $"f")).as[String].collect()
    assert(got.toSeq == Seq("fb", "fb", "v"))
  }

  test("saltedJoin == plain equi-join on skewed keys, shuffles on (key, salt)") {
    import org.apache.spark.sql.functions.{col, lit}
    // fact: one hot key (90% of rows) + a long tail
    val fact = ((1 to 90).map(i => (7L, i.toLong)) ++
      (1 to 10).map(i => (i.toLong % 5, 1000L + i)))
      .toDF("k", "row_id")
    val dim = (0L to 10L).map(i => (i, s"name_$i")).toDF("k", "name")
    val salted = saltedJoin(fact, dim, "k", salt = 4, saltBy = col("row_id"))
      .select("k", "row_id", "name").as[(Long, Long, String)].collect().toSet
    val plain = fact.join(dim, Seq("k"))
      .select("k", "row_id", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain, "salting must not change the join result")
    assert(salted.size == 100)
    // the hot key's rows spread over >1 salt bucket
    val buckets = fact.filter(col("k") === 7L)
      .withColumn("_s", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(col("row_id")), lit(4)))
      .select("_s").distinct().count()
    assert(buckets > 1, "hot key must be split across salt buckets")
  }

  test("sortedSetAggSalted == sortedSetAgg on skewed real data") {
    val e = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select($"user_id", $"event_type")
    val direct = e.groupBy("user_id").agg(sortedSetAgg($"event_type").as("types"))
      .as[(Long, String)].collect().sortBy(_._1)
    val salted = sortedSetAggSalted(e, Seq("user_id"), $"event_type", "types", salt = 4)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(salted.toSeq == direct.toSeq)

    // a deliberately skewed key (every row same user) still matches
    val skew = Seq.tabulate(1000)(i => (7L, s"t${i % 5}")).toDF("user_id", "event_type")
    val s2 = sortedSetAggSalted(skew, Seq("user_id"), $"event_type", "types", salt = 8)
      .as[(Long, String)].head()
    assert(s2 == ((7L, "t0, t1, t2, t3, t4")))
  }
}
