package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SRI-style lag-agreement over a dense regular grid — the reference's
  * flagship epoch-grid engine (/root/reference/scripts/functions/sri.R:
  * episodes → 30s ticks :27-39 → keep-last dedup :37-39 → complete per-day
  * grid :47-54 → gap-fill :57-61 → score 200·mean(s[t]==s[t+lag])−100
  * :4-9), re-expressed as ONE distributed dataflow instead of the
  * reference's per-participant future_lapply fan-out
  * (/root/reference/scripts/sri.R:102-141).
  *
  * Two surfaces:
  *  - `episodeGrid` — the faithful reference shape: (entity, start, end,
  *    status) episodes densified to ticks with keep-last overlap dedup;
  *  - `activityRegularity` — the transcripts instantiation: status = "any
  *    turn in this tick", measuring day-over-day conversation regularity.
  *
  * Scale: the grid explode is TWO-LEVEL — day chunks first, then ticks
  * within a chunk (the reference's per-day grid shape, sri.R:47-54) — so the
  * fan-out of any single Generate call is bounded by ticksPerDay, never by
  * the whole entity span (a 3-year 30s-tick span would otherwise be one
  * ~3.2M-element array in one task). Every stage shuffles on the same
  * entity key, so Catalyst reuses one exchange across dedup/fill/lag;
  * mega-entities are bounded by span × ticksPerDay, not by turn count (the
  * grid is the same size however many raw turns fall in it).
  */
object Sri {

  /** Two-level dense tick grid: input (e, lo, hi) tick spans → one row per
    * (e, tick) for every tick in [lo, hi]. Level 1 explodes day-sized chunk
    * indices, level 2 the ticks within a chunk clipped to the span — so no
    * single Generate materializes a whole span. Ticks must be non-negative. */
  private def denseTickGrid(span: DataFrame, tickSeconds: Int): DataFrame = {
    val chunk = math.max(86400L / tickSeconds, 1L) // ≈ one day of ticks
    span
      .selectExpr("e", "lo", "hi", s"explode(sequence(lo div $chunk, hi div $chunk)) AS c")
      .selectExpr("e",
        s"explode(sequence(greatest(lo, c * $chunk), least(hi, c * $chunk + ${chunk - 1}))) AS tick")
  }

  /** Per-tick activity status on the dense grid: 1 = at least one source
    * row in the tick, 0 = gap (shared by both activityRegularity forms). */
  private def activityStatusGrid(
      turns: DataFrame,
      entity: Column,
      ts: Column,
      tickSeconds: Int): DataFrame = {
    val active = turns
      .select(entity.as("e"), (unix_timestamp(ts.cast("timestamp")) / tickSeconds).cast("long").as("tick"))
      .groupBy(col("e"), col("tick"))
      .agg(lit(1).as("st"))
    val span = active.groupBy(col("e")).agg(min("tick").as("lo"), max("tick").as("hi"))
    denseTickGrid(span, tickSeconds)
      .join(active, Seq("e", "tick"), "left")
      .select(col("e"), col("tick"), coalesce(col("st"), lit(0)).as("status"))
  }

  /** Reference SRI score over a status series: 200·mean(agree)−100. */
  private def score(statusOrdered: DataFrame, entity: Column, lagTicks: Int): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(col("tick"))
    statusOrdered
      .withColumn("_prev", lag(col("status"), lagTicks).over(w))
      .where(col("_prev").isNotNull)
      .groupBy(entity.as("conv_id"))
      .agg((lit(200.0) * avg((col("status") === col("_prev")).cast("double")) - 100.0).as("sri"))
  }

  /** Faithful reference pipeline over (entity, episode_start, episode_end,
    * status) episodes: explode to ticks, keep-last per tick (overlapping
    * episodes: later source wins, sri.R:37-39), dense per-entity grid over
    * the full span, fill gaps with `fillStatus` (sri.R:57-61 fills 0),
    * then the lag score. */
  def episodeSri(
      episodes: DataFrame,
      entity: Column,
      start: Column,
      end: Column,
      status: Column,
      srcOrder: Column,
      tickSeconds: Int,
      lagTicks: Int,
      fillStatus: Int = 0): DataFrame = {
    val ticks = episodes
      .select(
        entity.as("e"),
        srcOrder.as("src"),
        status.as("st"),
        explode(sequence(
          (unix_timestamp(start.cast("timestamp")) / tickSeconds).cast("long"),
          (unix_timestamp(end.cast("timestamp")) / tickSeconds).cast("long"))).as("tick"))
    val keepLast = Window.partitionBy(col("e"), col("tick")).orderBy(col("src").desc)
    val deduped = ticks
      .withColumn("_rn", row_number().over(keepLast))
      .where(col("_rn") === 1)
      .select(col("e"), col("tick"), col("st"))
    val span = deduped.groupBy(col("e")).agg(min("tick").as("lo"), max("tick").as("hi"))
    val filled = denseTickGrid(span, tickSeconds)
      .join(deduped, Seq("e", "tick"), "left")
      .withColumn("status", coalesce(col("st"), lit(fillStatus)))
    score(filled.select(col("e"), col("tick"), col("status")), col("e"), lagTicks)
  }

  /** Per-bucket SRI (reference weekly SRI, sri.R:181-195): the lag-agreement
    * score grouped by (entity, bucket of the current tick). Feed the result
    * to Sliding.slidingStats for the sliding 3/26-bucket SRI (F3,
    * /root/reference/scripts/functions/sri.R:96-121). */
  private def scoreBucketed(
      statusOrdered: DataFrame,
      entity: Column,
      tickSeconds: Int,
      lagTicks: Int,
      bucketSeconds: Long): DataFrame = {
    val w = Window.partitionBy(entity).orderBy(col("tick"))
    statusOrdered
      .withColumn("_prev", lag(col("status"), lagTicks).over(w))
      .where(col("_prev").isNotNull)
      .withColumn("bucket_start",
        timestamp_seconds((col("tick") * tickSeconds / bucketSeconds).cast("long") * bucketSeconds))
      .groupBy(entity.as("conv_id"), col("bucket_start"))
      .agg((lit(200.0) * avg((col("status") === col("_prev")).cast("double")) - 100.0).as("sri"))
  }

  /** Bucketed variant of activityRegularity (e.g. daily/weekly SRI series). */
  def activityRegularityBucketed(
      turns: DataFrame,
      entity: Column,
      ts: Column,
      tickSeconds: Int,
      lagTicks: Int,
      bucketSeconds: Long): DataFrame =
    scoreBucketed(activityStatusGrid(turns, entity, ts, tickSeconds), col("e"),
      tickSeconds, lagTicks, bucketSeconds)

  /** Transcripts instantiation: per-tick activity status (1 = at least one
    * turn in the tick) on a dense grid spanning each entity's first..last
    * tick; day-over-day regularity = lag of one day in ticks. */
  def activityRegularity(
      turns: DataFrame,
      entity: Column,
      ts: Column,
      tickSeconds: Int,
      lagTicks: Int): DataFrame =
    score(activityStatusGrid(turns, entity, ts, tickSeconds), col("e"), lagTicks)
}
