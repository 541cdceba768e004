package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming face of the dedup family (SURVEY.md §2.3 D1 / content
  * canonicalization, §2.10 streaming): duplicate suppression over an
  * unbounded stream with WATERMARK-BOUNDED state.
  *
  * Batch exact dedup is a hash shuffle over the full dataset; a streaming
  * analog cannot hold every key ever seen. `dropDuplicatesWithinWatermark`
  * keeps a key's state only until the event-time watermark passes it, so
  * state is O(keys within the lateness horizon) — the right contract for
  * ingest pipelines where duplicates arrive close together (at-least-once
  * sources, retried uploads), and the same eviction model as the engine's
  * other stateful streaming surfaces (StreamTier windows,
  * StatefulMeasures timeouts). A duplicate arriving AFTER the horizon is
  * emitted again by construction — exactly the semantics the downstream
  * IceTable keyed-append idempotency or a periodic batch `Dedup.exact`
  * compaction closes at rest.
  */
object StreamDedup {

  /** First arrival per `keys` wins; re-arrivals within the watermark
    * horizon are dropped. `tsCol` is the event-time column the watermark
    * tracks. */
  def dropDupes(stream: DataFrame, tsCol: String, lateness: String, keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, lateness).dropDuplicatesWithinWatermark(keys)

  /** Content canonicalization on a stream: one surviving row per
    * normalized-content fingerprint (case/whitespace-insensitive, the
    * same `TextFunctions.fingerprint` the batch canonicalizer keys on)
    * within the watermark horizon. The fingerprint rides along as
    * `content_fp` for downstream lineage; the input must not already
    * carry a `content_fp` column (withColumn would silently replace an
    * upstream-stamped value — rejected here instead). */
  def dropDupContent(stream: DataFrame, tsCol: String, lateness: String, text: Column): DataFrame = {
    require(!stream.columns.contains("content_fp"),
      "dropDupContent emits its own content_fp column; rename the input's first")
    stream
      .withColumn("content_fp", TextFunctions.fingerprint(text))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("content_fp")
  }
}
