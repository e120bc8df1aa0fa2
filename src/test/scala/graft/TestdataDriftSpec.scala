package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime/testdata drift canary (VERDICT r8 item 7).
  *
  * Round 8 closed green and then 61 queries went dark because the
  * sandbox's Spark runtime and testdata generation shifted underneath
  * the build (TIMESTAMP(NANOS)+nanosAsLong → TIMESTAMP(MICROS) read
  * as TIMESTAMP_NTZ under Spark 4.1.2). This spec pins every
  * load-bearing assumption about the lake so the NEXT drift fails one
  * named test with a precise message instead of 61 queries with
  * DATATYPE_MISMATCH noise.
  *
  * Two layers:
  *  1. raw physical read — what the runtime hands us for each table's
  *     columns (events.ts is allowed its three known physical shapes,
  *     each of which [[graft.pipeline.Tables]] canonicalizes);
  *  2. the canonical view — Tables.t("events").ts MUST be a micros
  *     TimestampType in a UTC session, because every downstream query
  *     and every oracle hash depends on exactly that rendering.
  */
class TestdataDriftSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  val sf = SparkTesting.sf

  private def raw(name: String) = spark.read.parquet(s"$sf/$name.parquet")

  /** name → (column → expected dtype AS READ by the current runtime).
    * Exact match: a widened or re-typed column is drift even if Spark
    * could still read it. Pinned from the sf0.001 lake under Spark
    * 4.1.2 (int32 dimension keys arrive as IntegerType; the parquet
    * timestamp[us] date columns arrive as TIMESTAMP_NTZ under 4.x
    * NTZ inference — if a future runtime flips them to TimestampType
    * this spec names the change before any oracle hash does). */
  val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType, "label" -> IntegerType,
      "embedding" -> ArrayType(FloatType, containsNull = true))
  )

  for ((table, cols) <- expected.toSeq.sortBy(_._1)) {
    test(s"raw $table columns keep their pinned dtypes") {
      val schema = raw(table).schema
      val drift = cols.toSeq.sortBy(_._1).flatMap { case (c, want) =>
        schema.find(_.name == c) match {
          case None => Some(s"$c MISSING (runtime/testdata drift)")
          case Some(f) if f.dataType != want =>
            Some(s"$c reads as ${f.dataType.sql}, pinned ${want.sql}")
          case _ => None
        }
      }
      assert(drift.isEmpty, drift.mkString("; "))
    }
  }

  test("raw events.ts physical shape is one Tables.t knows how to canonicalize") {
    val dt = raw("events").schema("ts").dataType
    val known: Set[DataType] = Set(LongType, TimestampNTZType, TimestampType)
    assert(known.contains(dt),
      s"events.ts reads as ${dt.sql} — a NEW physical shape; teach " +
        "graft.pipeline.Tables.t the conversion before anything else " +
        "(61 queries sit behind it)")
    val others = Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    val schema = raw("events").schema
    val drift = others.toSeq.sortBy(_._1).flatMap { case (c, want) =>
      schema.find(_.name == c) match {
        case None => Some(s"$c MISSING")
        case Some(f) if f.dataType != want =>
          Some(s"$c reads as ${f.dataType.sql}, pinned ${want.sql}")
        case _ => None
      }
    }
    assert(drift.isEmpty, drift.mkString("; "))
  }

  test("canonical events view: ts is micros TimestampType in a UTC session") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC",
      "session zone moved off UTC — NTZ reinterpretation and oracle " +
        "rendering both assume UTC")
    val ev = graft.pipeline.Tables.t(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"Tables.t left events.ts as ${ev.schema("ts").dataType.sql}")
    // value check, not just dtype: the canonical instants must agree
    // with the raw wall-clock (drift here = silent data corruption,
    // the worst failure mode of a conversion layer)
    val rawRow = raw("events").selectExpr(
      "min(cast(ts as string))", "max(cast(ts as string))").head
    val canRow = ev.selectExpr(
      "min(cast(ts as string))", "max(cast(ts as string))").head
    assert(rawRow == canRow,
      s"canonicalized instants moved: raw=$rawRow canonical=$canRow")
  }
}
