package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One decoded point (named fields for a readable exploded schema). */
final case class GPoint(ts_us: Long, v: Double)

/** Gorilla tier-compression surface. The aggregate itself is the native
  * Catalyst `plans.GorillaBlockAgg` (TypedImperativeAggregate — primitive
  * update path, partial buffers serialized with exactly the live slots). */
object GorillaAgg {

  /** Column-level aggregate: gorilla block of (unix_micros(ts), value).
    * Null/NaN input rows are skipped inside the aggregate, so no pre-filter
    * is needed and it fuses with stat-block aggregates in one
    * groupBy().agg(...) (one scan, one shuffle — TierStore). */
  def gorillaBlock(tsUs: Column, value: Column): Column =
    graft.plans.GorillaBlockAgg.gorillaBlock(tsUs, value)

  /** Build a Gorilla-compressed tier: one block per (entity, bucket), plus
    * point count and block size (bytes/point is the BASELINE.md compression
    * metric). Null measures are skipped (na.rm parity — nulls are not
    * representable in the block; see Gorilla scaladoc). */
  def compressedTier(
      raw: DataFrame,
      entity: Column,
      ts: Column,
      value: Column,
      interval: String): DataFrame = {
    raw
      .where(value.isNotNull && !isnan(value))
      .groupBy(entity.as("conv_id"), window(ts, interval).as("w"))
      .agg(gorillaBlock(unix_micros(ts.cast("timestamp")), value.cast("double")).as("block"))
      .withColumn("bucket_start", col("w.start"))
      .drop("w")
      .withColumn("n_points", udf((b: Array[Byte]) => Gorilla.pointCount(b)).apply(col("block")))
      .withColumn("block_bytes", length(col("block")))
  }

  /** Decode a block column to array<struct<ts_us,v>> (explode to re-expand).
    * Scala UDF at the decode edge only — encode/merge stay in the
    * aggregate; hot rollup paths never decode. */
  def decodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => Gorilla.decodeSeq(b).map { case (t, v) => GPoint(t, v) })
}
