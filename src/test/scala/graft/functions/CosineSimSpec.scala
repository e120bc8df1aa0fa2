package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.sim.Similarity

class CosineSimSpec extends AnyFunSuite {
  private lazy val spark = SparkTesting.spark
  import spark.implicits._

  test("native cosine matches compositional HOF cosine on random doubles") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("native"),
        Similarity.cosineComposed($"a", $"b").as("composed"))
    val bad = df.filter(abs($"native" - $"composed") > 1e-12).count()
    assert(bad === 0)
  }

  test("float arrays widen exactly: native(float) == composed(cast to double)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((
      Array.fill(32)(rnd.nextFloat()), Array.fill(32)(rnd.nextFloat())))
    val df = rows.toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("native"),
        Similarity.cosineComposed($"a".cast("array<double>"), $"b".cast("array<double>"))
          .as("composed"))
    // bit-for-bit: float widening is exact, accumulation order identical
    val bad = df.filter($"native" =!= $"composed").count()
    assert(bad === 0)
  }

  test("null semantics: null array, length mismatch, null element → NULL") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Seq(1.0, 2.0), null),
        Row(2L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
        Row(3L, Seq(1.0, null), Seq(1.0, 2.0)),
        Row(4L, Seq(3.0, 4.0), Seq(3.0, 4.0)))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id bigint, a array<double>, b array<double>"))
    val out = df.select($"id", Similarity.cosine($"a", $"b").as("c"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1)); assert(out(1).isNullAt(1)); assert(out(2).isNullAt(1))
    assert(math.abs(out(3).getDouble(1) - 1.0) < 1e-12)
  }

  test("SQL registration via GraftExtensions: cosine_sim callable from SQL") {
    val one = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
    val orth = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(orth) < 1e-12)
  }

  test("whole-stage codegen path is exercised (no fallback exception)") {
    // force codegen-only evaluation: any fallback would throw
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val n = Seq((Array(1.0, 2.0), Array(2.0, 1.0)))
        .toDF("a", "b")
        .select(Similarity.cosine($"a", $"b").as("c"))
        .filter($"c" > 0).count()
      assert(n === 1)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
