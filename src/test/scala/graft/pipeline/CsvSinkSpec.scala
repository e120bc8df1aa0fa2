package graft.pipeline

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

class CsvSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  test("every part file starts with the UTF-8 BOM; payload bytes are plain CSV") {
    val out = Files.createTempDirectory("bomcsv").resolve("t").toString
    val df = Seq((1L, "álpha"), (2L, "beta")).toDF("id", "name")
      .orderBy("id").coalesce(1)
    CsvSink.writeCsvUtf8Sig(df, out)

    val parts = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(p => p.split('/').last.startsWith("part-")).sorted
    assert(parts.nonEmpty)
    parts.foreach { p =>
      val bytes = Files.readAllBytes(Paths.get(p))
      // byte-level: EF BB BF signature, then the headered CSV payload
      assert(bytes.take(3).sameElements(CsvSink.Bom), s"missing BOM in $p")
      val body = new String(bytes.drop(3), java.nio.charset.StandardCharsets.UTF_8)
      assert(body.startsWith("id,name\n"))
      assert(body.contains("1,álpha"))
    }
  }

  test("swap leaves no .bom.tmp/.bom.bak residue; a crash's leftovers are healed by re-run") {
    val out = Files.createTempDirectory("bomcsv").resolve("swap").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name").coalesce(1)
    CsvSink.writeCsvUtf8Sig(df, out)
    def names() = Files.list(Paths.get(out)).toArray.map(_.toString.split('/').last)
    assert(!names().exists(n => n.endsWith(".bom.tmp") || n.endsWith(".bom.bak")),
      "clean run must not leave swap intermediates")
    // simulate a crash mid-swap from a previous run: stray bak+tmp on
    // disk. They are DOT-prefixed, so a reader hitting the directory
    // BEFORE the healing re-run must not see duplicated rows — Spark
    // input globs skip '.'-prefixed files.
    Files.write(Paths.get(out, ".part-junk.csv.bom.bak"), "id,name\n9,z\n".getBytes)
    Files.write(Paths.get(out, ".part-junk.csv.bom.tmp"), "id,name\n9,z\n".getBytes)
    assert(CsvSink.readCsvUtf8Sig(spark, out).count() == 2,
      "crash leftovers must be invisible to readers")
    CsvSink.writeCsvUtf8Sig(df, out) // recovery = re-run (mode overwrite)
    assert(!names().exists(n => n.endsWith(".bom.tmp") || n.endsWith(".bom.bak")))
    assert(!names().contains(CsvSink.InProgressMarker),
      "completed sink must clear the in-progress marker")
    val back = CsvSink.readCsvUtf8Sig(spark, out)
    assert(back.count() == 2)
    // a crash DURING the swap leaves the marker — readers must fail
    // fast on a possibly-incomplete export, not serve it silently
    Files.write(Paths.get(out, CsvSink.InProgressMarker), Array.empty[Byte])
    val e = intercept[java.io.IOException] { CsvSink.readCsvUtf8Sig(spark, out) }
    assert(e.getMessage.contains("interrupted mid-swap"))
    CsvSink.writeCsvUtf8Sig(df, out) // re-run heals the marker too
    assert(CsvSink.readCsvUtf8Sig(spark, out).count() == 2)
  }

  test("BOM roundtrip: readCsvUtf8Sig restores the exact pre-sink schema and rows") {
    val out = Files.createTempDirectory("bomcsv").resolve("rt").toString
    val df = Seq(("1", "a"), ("2", "b"), ("3", "c")).toDF("k", "v")
    CsvSink.writeCsvUtf8Sig(df, out)
    val back = CsvSink.readCsvUtf8Sig(spark, out)
    assert(back.columns.toSeq == Seq("k", "v")) // no U+FEFF residue
    assert(back.orderBy("k").collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "a"), ("2", "b"), ("3", "c")))
  }
}
