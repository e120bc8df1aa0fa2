package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

class RollingMinHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTesting.spark
  import spark.implicits._

  /** Direct O(n·k) reference: min over windows of the canonical
    * polynomial — must equal the O(1)-update rolling form. */
  private def direct(s: String, k: Int): Option[Long] = {
    val b = s.getBytes("UTF-8")
    val B = RollingMinHash.Base; val M = RollingMinHash.Mod
    if (b.length < k) None
    else Some((0 to b.length - k).map { i =>
      (i until i + k).foldLeft(0L)((h, j) => (h * B + (b(j) & 0xff)) % M)
    }.min)
  }

  test("rolling update == direct polynomial on random strings") {
    val rnd = new scala.util.Random(11)
    val docs = Seq.tabulate(100)(i =>
      (i.toLong, rnd.alphanumeric.take(5 + rnd.nextInt(60)).mkString))
    val got = docs.toDF("id", "text")
      .select($"id", RollingMinHash($"text", 8).as("fp"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    docs.foreach { case (id, s) => assert(got(id) == direct(s, 8), s"doc $id: '$s'") }
  }

  test("shared k-gram ⇒ possible fingerprint collision; short input ⇒ NULL") {
    // two docs sharing their minimal window agree on the fingerprint
    val df = Seq((1L, "xxabcdefghxx"), (2L, "yyabcdefghyy"), (3L, "short"))
      .toDF("id", "text")
      .select($"id", RollingMinHash($"text", 8).as("fp")).collect()
    // windows of doc1/doc2 include the shared "abcdefgh"; min may or
    // may not be that window, but both must produce SOME value and
    // doc3 (5 bytes < 8) must be NULL
    assert(!df(0).isNullAt(1) && !df(1).isNullAt(1))
    assert(df(2).isNullAt(1))
    assert(direct("xxabcdefghxx", 8).isDefined)
  }

  test("SQL registration + codegen-only evaluation") {
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // non-foldable input: a literal argument would be constant-folded
      // through interpreted eval and never exercise doGenCode
      val v = Seq("abcdefghij").toDF("t")
        .selectExpr("rolling_min_hash(t, 8) AS fp")
        .head().getLong(0)
      assert(v == direct("abcdefghij", 8).get)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("SQL misuse gets clean errors, not internal exceptions") {
    val e1 = intercept[Exception] {
      Seq("x").toDF("t").selectExpr("rolling_min_hash(t)").collect()
    }
    assert(e1.getMessage.contains("rolling_min_hash") ||
      e1.getCause != null && e1.getCause.getMessage.contains("rolling_min_hash"))
    val e2 = intercept[Exception] {
      Seq("x").toDF("t").selectExpr("rolling_min_hash(t, t)").collect()
    }
    assert(e2.getMessage.contains("literal") ||
      e2.getCause != null && e2.getCause.getMessage.contains("literal"))
    // BIGINT literal k is accepted (widened), not a ClassCastException
    val ok = Seq("abcdefghij").toDF("t")
      .selectExpr("rolling_min_hash(t, CAST(8 AS BIGINT)) AS fp").head().getLong(0)
    assert(ok == direct("abcdefghij", 8).get)
  }
}
