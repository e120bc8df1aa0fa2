package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTesting
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTesting.spark

  test("meta extraction: byte length + md5 prefix, deterministic") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "image/fake", "hello".getBytes("UTF-8")),
      MediaRow(2L, "image/fake", Array[Byte]()))
      .toDS()
    val got = extractMeta(media).orderBy("doc_id").collect()
    assert(got(0).n_bytes == 5L)
    assert(got(0).content_fp == "5d41402a") // md5("hello") prefix
    assert(got(1).n_bytes == 0L)
    assert(got.forall(_.decode_status == "decoded"))
  }

  test("stub featurize: fixed dim, values in [0,1), deterministic across runs") {
    import spark.implicits._
    val media = Seq(MediaRow(1L, "audio/fake", "some payload bytes".getBytes)).toDS()
    val f1 = extractFeatures(media, 8).collect()(0)
    val f2 = extractFeatures(media, 8).collect()(0)
    assert(f1.feature.length == 8)
    assert(f1.feature.forall(v => v >= 0.0 && v < 1.0))
    assert(f1.feature.toSeq == f2.feature.toSeq)
  }

  test("frameSample: slices cover the payload; empty and short payloads behave") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "video/fake", "abcdefghij".getBytes), // 10 bytes, 3 frames
      MediaRow(2L, "video/fake", Array.emptyByteArray),  // no frames
      MediaRow(3L, "video/fake", "xy".getBytes)          // 2 bytes < 3 frames
    ).toDS()
    val frames = frameSample(media, 3).collect().sortBy(f => (f.doc_id, f.frame_id))
    val d1 = frames.filter(_.doc_id == 1L)
    assert(d1.map(_.n_bytes).sum == 10, "slices must cover every byte exactly once")
    assert(d1.map(_.frame_id).toSeq == Seq(0, 1, 2))
    assert(d1.head.first_b == 'a'.toInt && d1.last.last_b == 'j'.toInt)
    assert(frames.count(_.doc_id == 2L) == 0, "empty payload yields no frames")
    val d3 = frames.filter(_.doc_id == 3L)
    assert(d3.map(_.n_bytes).sum == 2 && d3.length == 2, "short payload: only non-empty slices")
  }

  test("REAL codec: javax.imageio decodes an actual PNG; garbage degrades, never throws") {
    import spark.implicits._
    // a real 7x5 RGB PNG, written by the JDK's own encoder in memory
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until 7).foreach(x => (0 until 5).foreach(y =>
      img.setRGB(x, y, (x * 41 + y * 7919) & 0xffffff)))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val media = Seq(
      MediaRow(1L, "image/png", png),
      MediaRow(2L, "image/png", "not a png at all".getBytes("UTF-8")),
      MediaRow(3L, "image/png", Array.emptyByteArray)).toDS()
    val got = decodeImageMeta(media).orderBy("doc_id").collect()
    assert(got(0) == ImageMeta(1L, 7, 5, 3, png.length.toLong, "decoded"),
      s"real PNG must decode to 7x5x3, got ${got(0)}")
    assert(got(1).decode_status == "undecodable" && got(1).width == -1)
    assert(got(2).decode_status == "undecodable",
      "empty payload degrades to a filterable row, not an exception")
  }

  test("REAL codec: javax.sound parses an actual PCM WAV header; garbage degrades, never throws") {
    import spark.implicits._
    // a real 16-bit mono 8kHz PCM WAV, written by the JDK's own encoder
    val nFrames = 800 // 100 ms at 8 kHz
    val pcm = Array.tabulate(nFrames * 2) { i =>
      if (i % 2 == 0) ((i * 37) & 0xff).toByte else (((i * 37) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    assert(wav.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq)
    val media = Seq(
      MediaRow(1L, "audio/wav", wav),
      MediaRow(2L, "audio/wav", "definitely not audio".getBytes("UTF-8")),
      MediaRow(3L, "audio/wav", Array.emptyByteArray)).toDS()
    val got = decodeAudioMeta(media).orderBy("doc_id").collect()
    assert(got(0) == AudioMeta(1L, 8000, 1, 16, nFrames.toLong, 100L,
      wav.length.toLong, "decoded"),
      s"real WAV must parse to 8kHz/1ch/16bit/800 frames/100ms, got ${got(0)}")
    assert(got(1).decode_status == "undecodable" && got(1).sample_rate_hz == -1)
    assert(got(2).decode_status == "undecodable",
      "empty payload degrades to a filterable row, not an exception")
  }

  test("documents → media rows plumbing at sf0.001") {
    val media = mediaFromDocuments(spark, SparkTesting.sf)
    val metas = extractMeta(media)
    assert(metas.count() == 500) // documents table is 500 rows at sf0.001
  }
}
