package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding windows over tier buckets with completeness filtering — the
  * engine form of the reference's `slider::slide_period(.before = k−1)`
  * plus its exact-width post-filter (`period_dt == 21 / == 182`,
  * /root/reference/scripts/sleepSD.R:66-123,137-194; sliding SRI
  * /root/reference/scripts/functions/sri.R:96-121).
  *
  * Works on ANY tier (daily, weekly) — aggregate-of-aggregates is valid
  * because the windowed stats run over the tier's mergeable block columns
  * (or their finalized means), exactly like the reference slides over
  * weekly summaries, not raw rows.
  *
  * Implementation: rangeBetween on the bucket's epoch index, so missing
  * buckets make a window INCOMPLETE (range, not rows) — then the
  * completeness filter keeps windows whose earliest bucket is exactly
  * (width−1) steps back. One shuffle on (entity), reused across all the
  * windowed stats.
  */
object Sliding {

  /** Add sliding stats over the previous `width` buckets (inclusive).
    * `stepSeconds` is the bucket stride (86400 for daily, 604800 weekly).
    * Emits `<name>_mean/_sd/_n` per value column plus `window_complete`. */
  def slidingStats(
      tier: DataFrame,
      entity: Column,
      bucket: Column,
      stepSeconds: Long,
      width: Int,
      values: Seq[(String, Column)],
      requireComplete: Boolean = true): DataFrame = {
    val idx = (unix_timestamp(bucket.cast("timestamp")) / stepSeconds).cast("long")
    val base = tier.withColumn("_bidx", idx)
    val wr = Window.partitionBy(entity).orderBy(col("_bidx"))
      .rangeBetween(-(width - 1).toLong, 0L)
    val withStats = values.foldLeft(base) { case (df, (name, c)) =>
      df.withColumn(s"${name}_mean", avg(c).over(wr))
        .withColumn(s"${name}_sd", stddev_samp(c).over(wr))
        .withColumn(s"${name}_n", count(c).over(wr))
    }
    // buckets are unique per entity, so count==width ⇔ every bucket present
    // (an endpoint-only check would wrongly pass windows with interior gaps)
    val complete = count(lit(1)).over(wr) === width
    val out = withStats.withColumn("window_complete", complete)
    (if (requireComplete) out.where(col("window_complete")) else out).drop("_bidx")
  }
}
