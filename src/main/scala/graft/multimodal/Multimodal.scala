package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batch-shaped decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container — see `StubCodec`): it is a deterministic fake keyed on the
  * payload bytes. Everything AROUND the stub is real Spark: the schema, the
  * binary column handling, the per-partition batch iteration (the Scala
  * analog of mapInPandas — one decoder instance per partition, amortized
  * over a batch of rows, never per-row init), and the explode shape of
  * frame sampling.
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

  /** Deterministic fake codec — stands in for libjpeg/ffmpeg/etc. Marked
    * clearly as a stub: replace `decodeFeature`/`thumbnail` bodies with real
    * decoders when the libs exist; signatures and batch usage stay. */
  object StubCodec {
    /** STUB: real impl would decode pixels and run a feature extractor. */
    def decodeFeature(bytes: Array[Byte], dims: Int): Array[Float] = {
      var h = 1125899906842597L
      bytes.foreach(b => h = h * 31 + b)
      Array.tabulate(dims)(i => (((h + i * 2654435761L) % 1000) / 1000.0f))
    }
    /** STUB: real impl would resize to (w, h) and re-encode. */
    def thumbnail(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      bytes.take(math.min(bytes.length, w * h / 64))
  }

  /** Deterministic synthetic media table (payload bytes keyed on id). */
  def synthMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")(((i % 3) + 3).toInt % 3)
      val bytes = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 131 + j * 7) % 251).toByte)
      MediaRow(i, f"conv${i % 97}%08d", kind, bytes, 64 + (i % 512).toInt, 64 + (i % 256).toInt, 1000 + (i % 60000))
    }
  }

  /** Feature extraction over binary payloads — per-partition batches (the
    * mapInPandas shape): decoder init once per partition, rows streamed. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { batch =>
      // per-partition decoder init would go here (session/native handles)
      batch.map { m =>
        val f = StubCodec.decodeFeature(m.bytes, dims)
        MediaFeatures(m.media_id, m.conv_id, m.kind, f, decoded_ok = f.nonEmpty)
      }
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
    media.toDF.groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      avg(col("duration_ms")).as("avg_duration_ms"),
      avg(col("width") * col("height")).as("avg_pixels"))
}
