package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.pipeline.Watermark._

class WatermarkSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark
  import spark.implicits._

  test("state round-trips through JSON; missing file → initial state") {
    val f = Files.createTempDirectory("wm").resolve("state.json").toString
    assert(load(f) == State(-1L, ""))
    save(f, State(42L, "2026-01-01T00:00:00Z"))
    assert(load(f) == State(42L, "2026-01-01T00:00:00Z"))
  }

  test("load is a real JSON parse: reordered fields, escapes, extra fields") {
    val dir = Files.createTempDirectory("wm")
    // field order flipped + an unknown field + an escaped quote in the stamp
    val f1 = dir.resolve("reordered.json")
    Files.writeString(f1,
      """{"note": "x", "last_run_utc": "run \"q\" 2026", "max_id": 7}""")
    assert(load(f1.toString) == State(7L, "run \"q\" 2026"))
    // save escapes: a stamp containing quote+backslash must round-trip
    val f2 = dir.resolve("escaped.json").toString
    save(f2, State(3L, """stamp "with" back\slash"""))
    assert(load(f2) == State(3L, """stamp "with" back\slash"""))
    // unparseable content is an error, never a silent fresh start
    val f3 = dir.resolve("garbage.json")
    Files.writeString(f3, "{not json")
    assertThrows[IllegalStateException](load(f3.toString))
    // parseable JSON without an integral max_id is equally an error
    val f4 = dir.resolve("noid.json")
    Files.writeString(f4, """{"max_id": "soon", "last_run_utc": ""}""")
    assertThrows[IllegalStateException](load(f4.toString))
  }

  test("incremental slice + advance: only new ids processed, watermark moves") {
    val df = (1L to 10L).toDF("id")
    val s0 = State(4L, "")
    val slice = incrementalSlice(df, "id", s0)
    assert(slice.count() == 6)
    val s1 = advance(slice, "id", s0, "2026-01-01T00:00:00Z")
    assert(s1.maxId == 10L)
    // empty batch: watermark holds
    val s2 = advance(incrementalSlice(df, "id", s1), "id", s1, "t")
    assert(s2.maxId == 10L)
  }
}
