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
