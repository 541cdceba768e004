package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense-grid gap-fill: the Spark re-expression of the reference's
  * 30-second epoch-grid densify + fill
  * (/root/reference/scripts/functions/sri.R:47-61: per-day complete grid via
  * seq.POSIXt + unnest, left join, fill 0/NA).
  *
  * Pipeline: per-entity bucket span → explode(sequence(lo, hi, interval)) →
  * left join the tier → LOCF and/or linear interpolation via window
  * functions. All built-ins (Sequence is a codegen'd Catalyst Generator);
  * the only shuffle is the join + window partitioning on conv_id, which
  * co-locate (same key) so Catalyst reuses one exchange.
  *
  * Scale note: the grid explode multiplies rows by span/interval. At 10^12
  * turns the grid is generated per (conv_id, day) — bounded fan-out per key
  * (the reference's 2880 epochs/day motif) — never a global cross join.
  */
object GapFill {

  /** Dense per-entity grid between each entity's min and max bucket.
    * Input must have columns (conv_id, bucket_start). Output: one row per
    * (conv_id, grid bucket) with all tier columns, null in gaps, plus
    * `is_gap` (1 where the tier had no row). */
  def denseGrid(tier: DataFrame, interval: String): DataFrame = {
    val span = tier
      .groupBy(col("conv_id"))
      .agg(min(col("bucket_start")).as("lo"), max(col("bucket_start")).as("hi"))
    val grid = span.select(
      col("conv_id"),
      explode(expr(s"sequence(lo, hi, INTERVAL $interval)")).as("bucket_start"))
    grid
      .join(tier, Seq("conv_id", "bucket_start"), "left")
      .withColumn("is_gap", when(col("n_rows").isNull, lit(1)).otherwise(lit(0)))
  }

  private def w(orderAsc: Boolean) = {
    val base = Window.partitionBy(col("conv_id"))
    val o = if (orderAsc) base.orderBy(col("bucket_start").asc)
            else base.orderBy(col("bucket_start").desc)
    o.rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** Last-observation-carried-forward over the grid. */
  def locf(c: Column): Column = last(c, ignoreNulls = true).over(w(orderAsc = true))

  /** Next-observation-carried-backward (for interpolation endpoints). */
  def nocb(c: Column): Column = last(c, ignoreNulls = true).over(w(orderAsc = false))

  /** Linear interpolation of `valueCol` across null runs on the dense grid.
    * Uses bucket epoch seconds as the x axis; endpoints (leading/trailing
    * null runs) fall back to LOCF/NOCB of the nearest value. */
  def interpolated(grid: DataFrame, valueCol: String): DataFrame = {
    val x = unix_timestamp(col("bucket_start")).cast("double")
    val v = col(valueCol)
    val prevV = locf(v)
    val nextV = nocb(v)
    val prevX = locf(when(v.isNotNull, x))
    val nextX = nocb(when(v.isNotNull, x))
    val lerp = prevV + (nextV - prevV) * (x - prevX) / (nextX - prevX)
    grid.withColumn(
      s"${valueCol}_interp",
      when(v.isNotNull, v)
        .when(prevV.isNull, nextV)          // leading gap
        .when(nextV.isNull, prevV)          // trailing gap
        .when(nextX === prevX, prevV)
        .otherwise(lerp))
  }
}
