package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.sim.Similarity

class SrpSignatureSpec extends AnyFunSuite {
  private lazy val spark = SparkTesting.spark
  import spark.implicits._

  test("native signature equals compositional HOF form on random doubles") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)(Array.fill(64)(rnd.nextDouble() * 1.2 - 0.6))
    val df = rows.toDF("v")
      .select(Similarity.srpSignature($"v").as("native"),
        Similarity.srpSignatureComposed(Similarity.srpQuantize($"v")).as("composed"))
    assert(df.filter($"native" =!= $"composed").count() === 0)
    // signatures vary (not all the same constant)
    assert(df.select(countDistinct($"native")).head().getLong(0) > 100)
  }

  test("float input widens exactly: native(float) == composed(quantized double)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)(Array.fill(64)(rnd.nextFloat() - 0.5f))
    val df = rows.toDF("v")
      .select(Similarity.srpSignature($"v").as("native"),
        Similarity.srpSignatureComposed(
          Similarity.srpQuantize($"v".cast("array<double>"))).as("composed"))
    assert(df.filter($"native" =!= $"composed").count() === 0)
  }

  test("signatures on the testdata corpus match the registered query") {
    // the q_embed_srp_sig result IS the native expression's output —
    // anchor the two so the query can never drift off the expression
    val direct = graft.pipeline.Tables.t(spark, SparkTesting.sf, "embeddings")
      .select($"vec_id", Similarity.srpSignature($"embedding").as("sig"))
      .as[(Long, Long)].collect().toMap
    val q = graft.SparkEntry.queries("q_embed_srp_sig")(spark, SparkTesting.sf)
      .select("vec_id", "sig").as[(Long, Long)].collect().toMap
    assert(direct === q)
    direct.values.foreach(s => assert(s >= 0 && s < (1L << 32)))
  }

  test("null semantics: null array and null element → NULL signature") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null),
        Row(2L, Seq(0.1, null)),
        Row(3L, Seq(0.1, -0.2)))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id bigint, v array<double>"))
    val out = df.select($"id", Similarity.srpSignature($"v").as("s"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1)); assert(out(1).isNullAt(1)); assert(!out(2).isNullAt(1))
  }

  test("SQL registration + codegen-only evaluation (no fallback exception)") {
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val viaSql = spark.sql(
        "SELECT srp_signature(array(0.1d, -0.2d, 0.3d)) AS s").head().getLong(0)
      val viaCol = Seq(Array(0.1, -0.2, 0.3)).toDF("v")
        .select(Similarity.srpSignature($"v").as("s")).head().getLong(0)
      assert(viaSql === viaCol)
      assert(viaSql >= 0 && viaSql < (1L << 32))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }
}
