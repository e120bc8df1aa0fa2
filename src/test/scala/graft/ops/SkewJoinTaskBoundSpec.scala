package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.ops.Ops._

/** Skew-join DEMONSTRATION (VERDICT r10 item 7): the flagship mart's
  * contact_id is the key SURVEY.md §7 flags as skewed at scale — one
  * celebrity contact can put its entire event history into a single
  * reducer of the enrichment join. This spec injects exactly that hot
  * key and measures per-task shuffle-read records through a
  * SparkListener: the UNSALTED sort-merge join concentrates the hot
  * key in one task, the salted path spreads it across `salt` tasks
  * with a mechanical bound — not a plan-shape argument, an observed
  * task-input ceiling.
  *
  * Broadcast is disabled inside the measurement: a broadcastable dim
  * is the NON-skewed regime (no shuffle to skew); salting exists for
  * the dim-too-big-to-broadcast case. AQE's skew split can't help at
  * these sizes (its thresholds are MB-scale), which is the point —
  * the operator bounds the task, not a runtime rescue. */
class SkewJoinTaskBoundSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  private final class TaskRecords extends SparkListener {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) buf.synchronized {
        buf += t.taskMetrics.shuffleReadMetrics.recordsRead
      }
    def snapshot: Seq[Long] = buf.synchronized(buf.toSeq)
  }

  /** Run `df` to completion with broadcast off and return the max
    * shuffle-read records observed by any single task. */
  private def maxTaskShuffleRead(df: => DataFrame): Long = {
    val sc = spark.sparkContext
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    val l = new TaskRecords
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // at KB-scale AQE fuses ALL shuffle partitions into one task and
    // the measurement reads key-blind byte-coalescing, not the key
    // distribution; at real scale these partitions are MB-huge and
    // never fuse, so pin the real-scale behavior
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    sc.addSparkListener(l)
    try {
      df.write.format("noop").mode("overwrite").save()
      // listener events post asynchronously; wait until the stream
      // goes quiet (no public drain hook from outside org.apache.spark)
      var last = -1
      var same = 0
      while (same < 3) {
        Thread.sleep(200)
        val n = l.snapshot.size
        if (n == last) same += 1 else { same = 0; last = n }
      }
    } finally {
      sc.removeSparkListener(l)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
    l.snapshot.maxOption.getOrElse(0L)
  }

  test("a hot contact_id floods one task unsalted; saltedJoin bounds every task") {
    val hot = 40000
    val salt = 8
    // the mart-fixture shape: events fact with ONE celebrity contact
    // (40k events) over a background of 1k uniform contacts, joined
    // to a contacts dim too big (by configuration) to broadcast
    val fact = spark.range(hot).select(lit(7L).as("contact_id"),
        col("id").as("event_id"))
      .union(spark.range(10000).select((col("id") % 1000).as("contact_id"),
        (col("id") + hot).as("event_id")))
    val dim = spark.range(1000).select(col("id").as("contact_id"),
      concat(lit("seg"), col("id") % 5).as("segment"))

    // 1. the baseline: plain equi-join puts the WHOLE hot key in one
    //    task — this is the failure mode, observed, not argued
    val unsaltedMax = maxTaskShuffleRead(fact.join(dim, "contact_id"))
    assert(unsaltedMax >= hot,
      s"fixture must actually skew: max task read $unsaltedMax < $hot")

    // 2. salted: the hot key spreads over `salt` reducers; every
    //    task's input is bounded by hot/salt + background share +
    //    dim replication — far below the unsalted flood
    val saltedMax = maxTaskShuffleRead(
      saltedJoin(fact, dim, "contact_id", salt, saltBy = col("event_id")))
    val bound = hot / salt + 10000 + dim.count() * salt
    assert(saltedMax <= bound,
      s"salted max task read $saltedMax exceeds bound $bound")
    assert(saltedMax < unsaltedMax / 2,
      s"salting must at least halve the hot task ($saltedMax vs $unsaltedMax)")

    // 3. and the result is still the plain join, row for row
    val a = saltedJoin(fact, dim, "contact_id", salt, saltBy = col("event_id"))
      .groupBy("contact_id").agg(count(lit(1)).as("n"), max("segment").as("s"))
      .orderBy("contact_id").collect().toSeq
    val b = fact.join(dim, "contact_id")
      .groupBy("contact_id").agg(count(lit(1)).as("n"), max("segment").as("s"))
      .orderBy("contact_id").collect().toSeq
    assert(a == b)
  }
}
