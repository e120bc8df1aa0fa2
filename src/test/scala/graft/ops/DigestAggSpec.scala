package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.ops.Ops._

/** The typed bounded-buffer Aggregator must produce byte-identical
  * digests to the compositional window form (collect_list + sort +
  * slice) it replaces for scale. */
class DigestAggSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("typed DigestAgg == window composition on sf0.001 events") {
    import spark.implicits._
    val k = 3
    val e = graft.pipeline.Tables.t(spark, SparkTesting.sf, "events")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ets"), col("event_type"))
      .withColumn("line", concat(col("ets"), lit(" — "), col("event_type")))

    // compositional reference: window top-k + collect_list re-sort
    val last = topNPerGroup(e, Seq("user_id"),
      Seq(col("ets").desc, col("event_id").desc), k)
    val lines = last.groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ets"), col("event_id"), col("line")))),
        x => x.getField("line")), "\n").as("tail"))
    val sets = e.groupBy("user_id").agg(sortedSetAgg(col("event_type")).as("types"))
    val expected = sets.join(lines, "user_id")
      .select(col("user_id"), col("types"), col("tail"))
      .as[(Long, String, String)].collect().sortBy(_._1)

    // typed aggregator
    val agg = new DigestAgg(k).toColumn
    val got = e.select(col("user_id"),
      struct(col("ets"), col("event_id"), col("event_type"), col("line")).as("ev"))
      .as[(Long, DigestEvent)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg)
      .map { case (uid, out) => (uid, out.types, out.tail) }
      .collect().sortBy(_._1)

    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, x) => assert(g == x) }
  }

  test("bounded buffer: state never exceeds k entries through reduce/merge") {
    val agg = new DigestAgg(2)
    val evs = (1 to 10).map(i => DigestEvent(f"2024-01-$i%02d 00:00:00", i, "t", s"l$i"))
    val b = evs.foldLeft(agg.zero)(agg.reduce)
    assert(b.lastK.size == 2)
    assert(b.lastK.map(_.event_id) == Seq(9L, 10L))
    val merged = agg.merge(b, evs.take(4).foldLeft(agg.zero)(agg.reduce))
    assert(merged.lastK.map(_.event_id) == Seq(9L, 10L))
    assert(agg.finish(merged) == DigestOut("t", "l9\nl10"))
  }
}
