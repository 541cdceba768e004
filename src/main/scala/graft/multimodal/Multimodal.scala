package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch-shaped decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Image (binary PPM) and audio (RIFF/WAV PCM16) decode is REAL — pure-JVM
  * codecs in `Codecs` (decode, box-filter resize, pixel/sample feature
  * vectors); corrupt payloads degrade to decoded_ok=false, never throw.
  * Only VIDEO keeps the clearly-marked `StubCodec` (no ffmpeg-class decoder
  * exists in this environment). The Spark shape is the mapInPandas analog:
  * per-partition batch iteration (decoder state amortized over the batch,
  * never per-row init) and the explode shape of frame sampling.
  *
  * Scale notes: media rows are large (MBs); the operators preserve
  * narrow-dependency pipelining (mapPartitions — NO shuffle), so a 100 TB
  * media scan is pure map work; downstream joins should go through the
  * extracted features/metadata, never the bytes.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      conv_id: String,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      conv_id: String,
      kind: String,
      feature: Array[Float],
      decoded_ok: Boolean)

  final case class FrameRow(media_id: Long, frame_idx: Int, offset_ms: Long, thumb: Array[Byte])

  /** Deterministic fake codec for VIDEO only (no ffmpeg-class decoder in
    * this environment) — clearly a stub: replace bodies with a real decoder
    * when one exists; signatures and batch usage stay. */
  object StubCodec {
    /** STUB: real impl would decode frames and run a feature extractor. */
    def decodeFeature(bytes: Array[Byte], dims: Int): Array[Float] = {
      var h = 1125899906842597L
      bytes.foreach(b => h = h * 31 + b)
      Array.tabulate(dims)(i => (((h + i * 2654435761L) % 1000) / 1000.0f))
    }
    /** STUB: real impl would decode a frame, resize and re-encode. */
    def thumbnail(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      bytes.take(math.min(bytes.length, w * h / 64))
  }

  /** Deterministic synthetic media table: REAL binary payloads — valid PPM
    * images (gradient keyed on id) and WAV PCM16 clips (seeded tone);
    * video rows carry opaque bytes for the stub path. */
  def synthMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(((i % 3) + 3).toInt % 3)
      kind match {
        case "image" =>
          val w = 16 + (i % 16).toInt; val h = 8 + (i % 8).toInt
          val rgb = Array.tabulate[Byte](w * h * 3) { j =>
            val px = j / 3
            (((px % w) * 255 / math.max(w - 1, 1) + i * (j % 3 + 1)) % 256).toByte
          }
          val bytes = Codecs.encodePpm(Codecs.Image(w, h, rgb))
          MediaRow(i, f"conv${i % 97}%08d", kind, bytes, w, h, 0L)
        case "audio" =>
          val rate = 8000
          val nSamples = (rate / 10 + (i % 800)).toInt // 100-200 ms
          val freq = 100.0 + (i % 40) * 25.0
          val samples = Array.tabulate[Short](nSamples)(j =>
            (math.sin(2 * math.Pi * freq * j / rate) * 12000).toShort)
          val bytes = Codecs.encodeWav(Codecs.Audio(rate, samples))
          MediaRow(i, f"conv${i % 97}%08d", kind, bytes, 0, 0, nSamples * 1000L / rate)
        case _ =>
          val bytes = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 131 + j * 7) % 251).toByte)
          MediaRow(i, f"conv${i % 97}%08d", kind, bytes, 64 + (i % 512).toInt, 64 + (i % 256).toInt, 1000 + (i % 60000))
      }
    }
  }

  /** Feature extraction over binary payloads — per-partition batches (the
    * mapInPandas shape): decoder state amortized per partition, rows
    * streamed. Image/audio decode is REAL (Codecs); video is the stub. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { batch =>
      batch.map { m =>
        val decoded: Option[Array[Float]] = m.kind match {
          case "image" => Codecs.decodePpm(m.bytes).map(Codecs.imageFeatures(_, dims))
          case "audio" => Codecs.decodeWav(m.bytes).map(Codecs.audioFeatures(_, dims))
          case _ => Some(StubCodec.decodeFeature(m.bytes, dims)) // video: stub
        }
        MediaFeatures(m.media_id, m.conv_id, m.kind,
          decoded.getOrElse(Array.fill(dims)(0.0f)), decoded_ok = decoded.isDefined)
      }
    }
  }

  /** Real image thumbnails: decode PPM, box-filter resize, re-encode —
    * one row per image, narrow (no shuffle); undecodable rows drop. */
  def thumbnails(media: Dataset[MediaRow], w: Int = 8, h: Int = 8): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.filter(_.kind == "image").flatMap { m =>
      Codecs.decodePpm(m.bytes).map(img =>
        FrameRow(m.media_id, 0, 0L, Codecs.encodePpm(Codecs.resize(img, w, h)))).iterator
    }
  }

  /** Frame sampling: one row per sampled frame (every `everyMs`), thumbnail
    * stubbed. Bounded fan-out per row (duration/everyMs), no shuffle. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 10000L): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1, (m.duration_ms / everyMs).toInt)
      (0 until n).iterator.map(i =>
        FrameRow(m.media_id, i, i * everyMs, StubCodec.thumbnail(m.bytes, 32, 32)))
    }
  }

  /** Media metadata rollup — joins tier machinery through metadata, not
    * bytes: bytes stay columnar-pruned away (ReadSchema excludes them). */
  def metadataStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF().groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      avg(col("duration_ms")).as("avg_duration_ms"),
      avg(col("width") * col("height")).as("avg_pixels"))
}
