package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.sources.FixtureBackend

/** E1 end-to-end: watermark-driven incremental runs over the DSv2
  * paged source, composed with the E2 merge. */
class RunPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("incremental lifecycle: first run, idempotent re-run, upstream growth") {
    val root = Files.createTempDirectory("pipeline").toString
    FixtureBackend.reset()

    // run 1: everything is new
    val (s1, raw1, latest1) = RunPipeline.runOnce(spark, root, 300)
    assert((s1, raw1, latest1) == ((300L, 300L, 300L)))

    // run 2, no new upstream rows: slice empty, lake unchanged
    val (s2, raw2, latest2) = RunPipeline.runOnce(spark, root, 300)
    assert((s2, raw2, latest2) == ((0L, 300L, 300L)))

    // upstream grows: only the delta is scanned and merged
    val (s3, raw3, latest3) = RunPipeline.runOnce(spark, root, 400)
    assert((s3, raw3, latest3) == ((100L, 400L, 400L)))

    // watermark survived all three runs on disk
    assert(Watermark.load(s"$root/state.json").maxId == 399L)
  }
}
