package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Golden regression for the flagship mart (SURVEY.md §5.3): the
  * full sf0.001 chatter_master output — values AND row order — hashed
  * against a checked-in digest. Any change to conform/union/enrich/
  * window/sort semantics shows up here first. */
class ChatterMasterGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("chatter_master sf0.001 matches the golden digest (8500 rows)") {
    // multiset digest: row-hashes sorted before folding, because the
    // synthetic lineitem has duplicate (orderkey, linenumber) pairs →
    // duplicate event_ids → ties the total order cannot break; row
    // ORDER is asserted separately by the invariant test below.
    val cm = ChatterMaster.chatterMaster(spark, SparkTesting.sf)
    // width parity with the reference's 27-column ChatterEvent
    // (run_ac_extraction.py:1199-1227): 17 conform columns + contact
    // pair + segment + 4 mart-resolved names + display + line
    assert(cm.columns.length == 27, cm.columns.mkString(", "))
    val cols = cm.columns.sorted.map(c => coalesce(col(c).cast("string"), lit(" NULL")))
    val got = cm.select(md5(concat_ws("", cols: _*)).as("h"))
      .agg(md5(concat_ws("", sort_array(collect_list("h")))).as("all"),
        count(lit(1)).as("n"))
      .head()
    assert(got.getLong(1) == 8500L)
    // re-pinned 2026-08-12 for 27-column reference parity (deal/stage/
    // tag pairs: order_id/order_title, stage_id/stage_name,
    // tag_id/tag_name added to the conform schema) — the conform-level
    // values of every new column are DuckDB-hash-verified through the
    // q_conform_union oracle; the mart adds no logic over them
    assert(got.getString(0) == "0b05ebee3644b1b502eff721fb8c62c7")
  }

  test("S9: per-contact digest TXT sink writes one file per contact") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("digests").toString
    val digests = Seq((1L, "digest one"), (2L, "digest two"))
      .toDF("contact_id", "digest")
    ChatterMaster.writeDigestTxt(digests, out)
    val files = new java.io.File(out).listFiles().map(_.getName).sorted
    assert(files.toSeq == Seq("contact_1.txt", "contact_2.txt"))
    val body = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "contact_2.txt")), "UTF-8")
    assert(body == "digest two")
  }

  test("flagship timeline invariants: per-contact chronological, ids unique") {
    import spark.implicits._
    val cm = ChatterMaster.chatterMaster(spark, SparkTesting.sf)
      .select($"contact_id".cast("long"), $"event_ts", $"event_id").as[(Long, String, String)]
      .collect()
    // global order: contact asc, then ts asc within contact
    val violations = cm.sliding(2).count {
      case Array((c1, t1, _), (c2, t2, _)) =>
        c1 > c2 || (c1 == c2 && t1 != null && t2 != null && t1 > t2)
      case _ => false
    }
    assert(violations == 0)
  }
}
