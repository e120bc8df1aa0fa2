package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.functions.Functions._

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  test("nullifBlank: '', 'nan', 'None', whitespace and NULL all null; value trimmed") {
    val got = Seq("", "nan", "None", "  ", null, " x ", "0")
      .toDF("v").select(nullifBlank($"v")).as[String].collect()
    assert(got.toSeq == Seq(null, null, null, null, null, "x", "0"))
  }

  test("safeInt: lenient coercion with default 0 (run_ac_extraction.py:58-63)") {
    val got = Seq("42", " 7 ", "oops", "", null, "-3")
      .toDF("v").select(safeInt($"v")).as[Long].collect()
    assert(got.toSeq == Seq(42L, 7L, 0L, 0L, 0L, -3L))
  }

  test("coalesceCandidates picks first non-blank") {
    val got = Seq(("", "nan", "c"), ("a", "b", "c"), ("", "", ""))
      .toDF("x", "y", "z")
      .select(coalesceCandidates($"x", $"y", $"z")).as[String].collect()
    assert(got.toSeq == Seq("c", "a", null))
  }

  test("decodeMap decodes with passthrough default") {
    val got = Seq("1", "0", "weird").toDF("v")
      .select(decodeMap($"v", Seq("1" -> "Active", "0" -> "Inactive"), $"v"))
      .as[String].collect()
    assert(got.toSeq == Seq("Active", "Inactive", "weird"))
  }

  test("extractIdFromUrl: trailing int before ? or end (py:83-87)") {
    val got = Seq("https://x/a/123", "https://x/a/123?b=1", "https://x/a/", "nope")
      .toDF("v").select(extractIdFromUrl($"v")).as[String].collect()
    assert(got.toSeq == Seq("123", "123", null, null))
  }

  test("mkName: trim-concat with fallback when both parts blank (py:1011-1013)") {
    val got = Seq(("Jo", "Do"), ("", "Do"), ("", ""), (null, null))
      .toDF("f", "l")
      .select(mkName($"f", $"l", lit("fb"))).as[String].collect()
    assert(got.toSeq == Seq("Jo Do", "Do", "fb", "fb"))
  }

  test("rowHash: positional, null→'' normalization per field") {
    val df = Seq(("a", null: String), (null: String, "a"),
      ("", null: String), (null: String, null: String))
      .toDF("x", "y")
      .select(rowHash(Seq($"x", $"y")).as("h"))
    val hs = df.as[String].collect()
    assert(hs(0) != hs(1))   // order matters: md5("a||") ≠ md5("||a")
    assert(hs(2) == hs(3))   // "" and NULL render identically
    // hash of ("a",null) = md5("a||")
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a||".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hs(0) == expected)
  }

  test("chatterLine skips blank parts (py:1411-1422)") {
    val got = Seq(("t1", "", "d"), ("t1", "who", "d"))
      .toDF("a", "b", "c")
      .select(chatterLine($"a", $"b", $"c")).as[String].collect()
    assert(got.toSeq == Seq("t1 — d", "t1 — who — d"))
  }

  test("synthEventId: source:id with hash fallback (py:1197-1200)") {
    val got = Seq(("7", "x"), (null, "x"))
      .toDF("id", "p")
      .select(synthEventId("src", $"id", md5($"p"))).as[String].collect()
    assert(got(0) == "src:7")
    assert(got(1).startsWith("src:") && got(1).length == 4 + 32)
  }

  test("canonicalForHash: map key order canonicalized, array order preserved (py:93-123)") {
    import org.apache.spark.sql.types._
    // same map content, different insertion order → same rendering
    val maps = Seq(Map("b" -> "2", "a" -> "1"), Map("a" -> "1", "b" -> "2"))
      .toDF("m")
    val r = maps.select(canonicalForHash($"m", MapType(StringType, StringType)).as("c"))
      .as[String].collect()
    assert(r(0) == r(1))
    assert(r(0) == """[{"key":"a","value":"1"},{"key":"b","value":"2"}]""")

    // arrays keep element order (lists are order-significant in the ref)
    val arrs = Seq(Seq("x", "y"), Seq("y", "x")).toDF("a")
    val ra = arrs.select(canonicalForHash($"a", ArrayType(StringType)).as("c"))
      .as[String].collect()
    assert(ra(0) != ra(1))

    // timestamps → ISO Z; null → ""
    val ts = Seq(java.sql.Timestamp.valueOf("2024-03-01 12:30:00")).toDF("t")
    assert(ts.select(canonicalForHash($"t", TimestampType)).as[String].head()
      == "2024-03-01T12:30:00Z")
    val nulls = Seq((null: String)).toDF("s")
    assert(nulls.select(canonicalForHash($"s", StringType)).as[String].head() == "")
  }

  test("contentHashDedup collapses typed duplicates regardless of map insertion order") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(
      ("1", Map("b" -> "2", "a" -> "1"), "r1"),
      ("1", Map("a" -> "1", "b" -> "2"), "r2")) // same content, shuffled map
      .toDF("k", "attrs", "run_id")
    val out = graft.ops.Ops.contentHashDedup(df, Seq("run_id"), col("run_id"))
    assert(out.count() == 1)
    assert(out.select("run_id").as[String].head() == "r1")
  }
}
