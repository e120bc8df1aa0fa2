package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting

/** Adversarial pins for the two r14 fan-out caps. At every tested SF
  * the caps are INERT (max seam bucket 10 < 16; max SRP bucket
  * 113 < 250), so the oracle gate can never show they fire — these
  * fixtures synthesize the crowd the caps exist for and assert the
  * quadratic mass is dropped while genuine signal survives. */
class HubCapAdversarialSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"hubcap-$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("seam cap: a 20-doc template boundary yields no pairs; a unique seam survives") {
    import spark.implicits._
    val seam = "UNIQUE-SEAM-16ch" // 16 chars
    val tmpl = "TEMPLATE-BOUND16" // 16 chars, shared by the crowd
    require(seam.length == 16 && tmpl.length == 16)
    val pad = "x" * 40
    // crowd: 20 docs ENDING with tmpl and 20 docs STARTING with tmpl
    // (df 20 > 16 on both sides → the 400 crossing pairs must vanish);
    // signal: doc 900 ends with seam, doc 901 starts with it.
    val docs =
      (0L until 20L).map(i => (i, s"a$i$pad$tmpl")) ++
      (100L until 120L).map(i => (i, s"$tmpl$pad$i")) ++
      Seq((900L, s"head$pad$seam"), (901L, s"$seam$pad tail"))
    val dir = tmpDir("seam")
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_chunk_boundary_overlap")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((900L, 901L)),
      s"expected ONLY the unique seam pair, got ${got.size} pairs: " +
        got.take(5).mkString(", "))
  }

  test("SRP bucket cap: 260 identical vectors pair nowhere; a distinct close pair survives") {
    import spark.implicits._
    // 260 copies of one vector: identical signatures → all four band
    // buckets hold 260 > SrpBucketCap → every crowd bucket drops, so
    // ZERO crowd pairs (their only collisions are mega-buckets).
    // Two near-identical distinct vectors land in small buckets and
    // must survive as a candidate pair.
    val base = Array.tabulate(64)(i => math.sin(i * 0.7).toFloat)
    // the survivors live in a DIFFERENT signature region than the
    // crowd (unrelated vector), so their buckets are small
    val other = Array.tabulate(64)(i => math.cos(i * 0.3).toFloat)
    val close = other.clone(); close(0) = other(0) + 1e-4f
    val rows =
      (0L until 260L).map(i => (i, base)) ++
      Seq((1000L, other), (1001L, close))
    val dir = tmpDir("srp")
    rows.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.SparkEntry.queries("q_embed_srp_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1000L, 1001L)),
      s"the close distinct pair must survive the cap, got: $got")
    assert(!got.exists { case (a, b) => a < 260L && b < 260L },
      s"crowd pairs must be dropped by SrpBucketCap, got: ${got.take(5)}")
  }
}
