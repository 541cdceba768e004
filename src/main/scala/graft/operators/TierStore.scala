package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IceTable

/** The assembled north-star pipeline: raw transcripts IceTable →
  * continuous-aggregate tier IceTables (1m → 1h → 1d), each tier row
  * carrying BOTH the mergeable stat block (query surface) and a
  * Gorilla-compressed block of the raw points in that bucket (compact
  * storage / exact replay), with per-tier retention expiry.
  *
  * Layout per tier table: (conv_id, bucket_start, n_rows, n_vals, sum,
  * sum_sq, min, max, sum_sin, sum_cos, gblock binary).
  * The 1m tier's gblock holds the raw (ts µs, value) points of that minute;
  * coarser tiers' gblocks hold their child tier's (bucket_start µs, sum)
  * series — each level is exactly reconstructable one level down.
  *
  * Retention ladder (the reference's post-infection windows generalized,
  * SURVEY.md §7.0): fine tiers expire early, coarse tiers live long —
  * expiry is an IceTable metadata-only snapshot (no data rewrite) keyed on
  * each tier's file stats.
  *
  * Scale: one job per tier level; tier N+1 reads ONLY tier N (never raw);
  * each level is ONE fused aggregate computing the stat block AND the
  * Gorilla block together (Rollup.rollup*WithGorilla) — no double scan and
  * no stat/gorilla join per tier. Stat pruning on the source bounds
  * incremental runs to changed days (pair with CheckpointedRollup for
  * resumability).
  */
object TierStore {

  final case class TierTables(t1m: IceTable, t1h: IceTable, t1d: IceTable)

  /** Build (or rebuild) the three tier tables under `root`/{1m,1h,1d}. */
  def build(
      spark: SparkSession,
      source: IceTable,
      root: String,
      value: Column): TierTables = {
    val raw = source.scan(spark)
    val withVal = raw.withColumn("_v", value)

    val t1m = IceTable(s"$root/1m")
    t1m.append(
      Rollup.rollupRawWithGorilla(withVal, col("conv_id"), col("ts"), col("_v"), "1 minute"),
      "bucket_start")

    val t1h = IceTable(s"$root/1h")
    t1h.append(Rollup.rollupTierWithGorilla(t1m.scan(spark), "1 hour"), "bucket_start")

    val t1d = IceTable(s"$root/1d")
    t1d.append(Rollup.rollupTierWithGorilla(t1h.scan(spark), "1 day"), "bucket_start")

    TierTables(t1m, t1h, t1d)
  }

  /** Retention ladder: expire each tier's buckets older than its TTL
    * relative to `nowUs`. Returns new snapshot ids (metadata-only). */
  def applyRetention(
      tiers: TierTables,
      nowUs: Long,
      ttl1mUs: Long,
      ttl1hUs: Long,
      ttl1dUs: Long): (Long, Long, Long) = (
    tiers.t1m.expireOlderThan(nowUs - ttl1mUs),
    tiers.t1h.expireOlderThan(nowUs - ttl1hUs),
    tiers.t1d.expireOlderThan(nowUs - ttl1dUs))
}
