package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, processed per-partition.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * container — see `stubDecode`): it derives deterministic fake
  * features from the bytes. Everything around it is real Spark
  * plumbing — typed Datasets over binary columns, mapPartitions
  * batch shape (one codec init per partition, not per row), and a
  * schema a real decoder would fill.
  *
  * Scale notes: media blobs dominate row size — keep them in their
  * own column so column pruning drops them unless the query actually
  * decodes; decode via mapPartitions so codec state amortizes; at
  * 100 TB the blobs live in parquet binary columns read with
  * maxPartitionBytes sized to a few blobs per task.
  */
object Multimodal {

  /** A media row: opaque payload + envelope metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, data: Array[Byte])

  /** Decoded metadata a real codec would produce. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      content_fp: String,   // md5 prefix of the payload
      decode_status: String)

  /** Fixed-stride "frame sample" features — the stub for a real
    * decode→resize→feature step. Deterministic in the bytes. */
  final case class MediaFeatures(doc_id: Long, feature: Array[Double])

  private def md5hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  /** STUB decode: a real build would decode the codec here (JPEG /
    * PCM / container demux). We emit deterministic pseudo-features:
    * `dim` byte samples at fixed strides, normalized to [0,1). */
  private def stubDecode(data: Array[Byte], dim: Int): Array[Double] =
    if (data.isEmpty) Array.fill(dim)(0.0) // empty payload → zero vector
    else {
      val n = data.length
      Array.tabulate(dim)(i => (data((i.toLong * n / dim).toInt % n) & 0xff) / 256.0)
    }

  /** Extract envelope metadata from a binary media column.
    * One digest instance per partition (the mapPartitions batch
    * shape a real codec needs). */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        MediaMeta(r.doc_id, r.data.length.toLong, md5hex(r.data).substring(0, 8), "decoded")
      }
    }
  }

  /** Decode + featurize (stubbed) — the plumbing for
    * decode/resize/frame-sample stages. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(r => MediaFeatures(r.doc_id, stubDecode(r.data, dim)))
    }
  }

  /** One sampled "frame": a contiguous byte slice of the payload with
    * envelope stats a real demuxer would emit. */
  final case class MediaFrame(doc_id: Long, frame_id: Int, n_bytes: Long,
                              first_b: Int, last_b: Int, frame_fp: String)

  /** Frame sampling: split each payload into `frames` contiguous
    * slices (video frame-sample / audio chunking stand-in) — a
    * row-generating (UDTF-shaped) transform via mapPartitions
    * flatMap; empty payloads and empty tail slices yield no rows. */
  def frameSample(media: Dataset[MediaRow], frames: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.data.length
        (0 until frames).iterator.flatMap { f =>
          val from = (f.toLong * n / frames).toInt
          val until = ((f + 1).toLong * n / frames).toInt
          if (until <= from) None
          else {
            val slice = java.util.Arrays.copyOfRange(r.data, from, until)
            Some(MediaFrame(r.doc_id, f, slice.length.toLong,
              slice.head & 0xff, slice.last & 0xff, md5hex(slice).substring(0, 8)))
          }
        }
      }
    }
  }

  /** A resized payload's envelope: sizes and output fingerprint. */
  final case class MediaResized(doc_id: Long, n_bytes_in: Long,
                                n_bytes_out: Long, out_fp: String)

  /** Fixed-stride byte downsample — the image-resize / audio-
    * downsample stand-in (a real build decodes, resamples, and
    * re-encodes here; the stride keeps every `stride`-th byte so the
    * transform is deterministic and oracle-checkable). Same
    * mapPartitions batch shape as the other codec stages; empty
    * payloads yield no rows. */
  def downsample(media: Dataset[MediaRow], stride: Int): Dataset[MediaResized] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        if (r.data.isEmpty) None
        else {
          val out = Array.range(0, r.data.length, stride).map(r.data(_))
          Some(MediaResized(r.doc_id, r.data.length.toLong,
            out.length.toLong, md5hex(out).substring(0, 8)))
        }
      }
    }
  }

  /** A decoded IMAGE's envelope — what a real vision-data pipeline
    * keys its filters on (resolution gates, aspect-ratio gates,
    * channel sanity) before any pixel work. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
                             channels: Int, n_bytes: Long,
                             decode_status: String)

  /** REAL image decode (PNG/BMP/GIF via `javax.imageio` — the JDK's
    * own codecs, no external libs): width/height/channels per blob,
    * same mapPartitions batch shape as the stub stages. This is the
    * production path the stubs stand in for; `q_multimodal_meta`
    * keeps the stub (deterministic, oracle-exact), and
    * MultimodalSpec drives THIS path with a real in-memory PNG.
    *
    * Corpus-scale decode discipline: a corrupt/unknown blob must
    * never fail the job — it becomes `decode_status = "undecodable"`
    * with −1 dims, a filterable row, because at 10^9 images some
    * payloads WILL be garbage and one bad blob must not kill a
    * 1000-executor stage. `ImageIO.setUseCache(false)` once per
    * partition keeps the decoder off local disk (executor temp dirs
    * are not sized for codec scratch at task concurrency). */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      it.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.data))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          ImageMeta(r.doc_id, -1, -1, -1, r.data.length.toLong, "undecodable")
        else
          ImageMeta(r.doc_id, img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, r.data.length.toLong, "decoded")
      }
    }
  }

  /** A decoded AUDIO stream's envelope — what an audio-data pipeline
    * gates on (sample-rate buckets, channel sanity, duration caps)
    * before any signal work. Durations in exact integer frames; the
    * millis derivation stays in integer arithmetic. */
  final case class AudioMeta(doc_id: Long, sample_rate_hz: Int,
                             channels: Int, bits_per_sample: Int,
                             n_frames: Long, duration_ms: Long,
                             n_bytes: Long, decode_status: String)

  /** REAL audio decode (WAV/AU/AIFF via `javax.sound.sampled` — the
    * JDK's own parsers, no external libs): container envelope per
    * blob, same mapPartitions batch shape and same corpus-scale
    * decode discipline as [[decodeImageMeta]] — a corrupt/unknown
    * payload becomes `decode_status = "undecodable"` with −1 dims
    * instead of failing the stage (at 10⁹ clips some payloads WILL
    * be garbage). Header-only: `getAudioFileFormat` reads the format
    * chunk without decoding sample data, so the per-blob cost is
    * O(header), not O(payload) — the right gate shape before an
    * expensive resample/feature stage. MultimodalSpec drives this
    * with a real in-memory PCM WAV; `q_multimodal_meta` keeps the
    * stub as the oracle-exact path. */
  def decodeAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val fmt =
          try javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(r.data))
          catch {
            // NonFatal, not just the two declared exceptions: the JDK
            // file readers throw unchecked errors (NegativeArraySize,
            // Arithmetic) on adversarially malformed WAV/AIFF headers,
            // and one such blob must not fail the whole partition.
            case scala.util.control.NonFatal(_) => null
          }
        if (fmt == null)
          AudioMeta(r.doc_id, -1, -1, -1, -1L, -1L,
            r.data.length.toLong, "undecodable")
        else {
          val af = fmt.getFormat
          val frames = fmt.getFrameLength.toLong
          val rate = af.getSampleRate.toInt
          // frame count may be unknown (-1) in streamed containers
          val durMs = if (frames < 0 || rate <= 0) -1L
                      else frames * 1000L / rate
          AudioMeta(r.doc_id, rate, af.getChannels,
            af.getSampleSizeInBits, frames, durMs,
            r.data.length.toLong, "decoded")
        }
      }
    }
  }

  /** Documents table → MediaRow dataset (text bytes standing in for
    * a real media payload; schema/partitioning identical). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.pipeline.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        col("text").cast("binary").as("data"))
      .as[MediaRow]
  }
}
