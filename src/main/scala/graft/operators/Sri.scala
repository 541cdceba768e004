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
    * single Generate materializes a whole span. Negative (pre-1970) ticks
    * are handled: chunk indexing floor-divides, so a chunk always starts
    * at/below `lo` (truncation would start above it and silently drop the
    * ticks in between). */
  private def denseTickGrid(span: DataFrame, tickSeconds: Int): DataFrame = {
    val chunk = math.max(86400L / tickSeconds, 1L) // ≈ one day of ticks
    span
      .selectExpr("e", "lo", "hi",
        s"explode(sequence(cast(floor(lo / $chunk.0D) as bigint), " +
          s"cast(floor(hi / $chunk.0D) as bigint))) AS c")
      .selectExpr("e",
        s"explode(sequence(greatest(lo, c * $chunk), least(hi, c * $chunk + ${chunk - 1}))) AS tick")
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
    * the full span with `fillStatus` in the gaps (sri.R:57-61 fills 0),
    * then the lag score.
    *
    * Computed WITHOUT materializing the dense grid: a tick t can disagree
    * with t−lag only if at least one of them carries a non-fill status
    * (everywhere else both sides are `fillStatus` and agree trivially), so
    * |disagree| is a full-outer join of the non-fill SUPPORT with its
    * +lag shift, restricted to the compared range — O(episode-ticks)
    * instead of the grid's O(span/tick) per entity (at the bench shape
    * ~300k support rows vs a 13M+ row grid; at a sparse 100 TB corpus the
    * difference between scanning activity and scanning time itself). The
    * keep-last dedup runs BEFORE the support filter, so a later source
    * overriding a tick to `fillStatus` removes it from the support exactly
    * as the dense grid would. Result-identical to [[episodeSriDense]]
    * (spec-pinned; the score's (T−D)/T arithmetic is exact-integer in
    * double, so the forms agree bit-for-bit mod the documented 200·x−100
    * association, absorbed by callers' 6-decimal rounding). */
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
    // re-cluster the deduped ticks by entity once — hash(e) satisfies the
    // per-tick and disagreement aggregates and the final span join (same
    // single-partitioning argument as activeTicks); the repartition moves
    // the time-bounded deduped set, not raw episode ticks
    val deduped = dedupedEpisodeTicks(episodes, entity, start, end, status, srcOrder, tickSeconds)
      .repartition(col("e"))
    // span straight from the EPISODES (no explode, no dedup): keep-last
    // changes which status a tick carries, never which ticks exist, so
    // the deduped span equals the episode tick-bound span — deriving it
    // here keeps the expensive explode+dedup subtree out of the span's
    // (reused) plan branches. Tick-explode parity: an episode with a NULL
    // start or end yields NO ticks (sequence(null, ...) is null → Generate
    // drops the row) and must not stretch the span either; an INVERTED
    // episode (end < start) yields the descending sequence's tick set, so
    // its span contribution is [least, greatest].
    val ta = tickOf(start, tickSeconds)
    val tb = tickOf(end, tickSeconds)
    val span = episodes
      .where(ta.isNotNull && tb.isNotNull)
      .groupBy(entity.as("e"))
      .agg(min(least(ta, tb)).as("lo"), max(greatest(ta, tb)).as("hi"))
      .where(col("hi") - col("lo") >= lagTicks)
    val support = deduped.where(col("st") =!= lit(fillStatus))
    val ranged = span.select(col("e"), (col("lo") + lagTicks).as("_rlo"), col("hi").as("_rhi"))
    val dis = lagDisagreements(support, ranged, lagTicks, fillStatus, bucketOf = None)
    span.join(dis, Seq("e"), "left")
      .withColumn("_t", col("hi") - col("lo") + 1 - lagTicks)
      .withColumn("_d", coalesce(col("_disagree"), lit(0L)))
      .select(col("e").as("conv_id"),
        (lit(200.0) * (col("_t") - col("_d")) / col("_t") - 100.0).as("sri"))
  }

  /** Shared sparse lag-disagreement core: count compared ticks where a
    * keyed status series disagrees with its own +lag shift, gaps reading
    * as `fillStatus`. ONE pass over the sparse `support` (e, tick, st)
    * instead of a full-outer self-join (whose two branches would each
    * re-derive the support's subtree): every support tick matters at two
    * compared positions — as the CURRENT value at `tick` and as the LAG
    * value at `tick + lag` — so a constant 2-fan explode plus an
    * (e, tick) aggregate reconstructs both sides of every comparison that
    * can possibly disagree (everywhere else both sides are `fillStatus`).
    * `ranged` = (e, _rlo, _rhi) clips to the compared range; `bucketOf`
    * groups the disagreement counts by a tick bucket (daily SRI series). */
  private def lagDisagreements(
      support: DataFrame,
      ranged: DataFrame,
      lagTicks: Int,
      fillStatus: Int,
      bucketOf: Option[Column => Column]): DataFrame = {
    val sides = support.select(col("e"), explode(array(
        struct(col("tick"), col("st").as("v"), lit(1).as("is_cur")),
        struct((col("tick") + lagTicks).as("tick"), col("st").as("v"), lit(0).as("is_cur"))
      )).as("s"))
      .select(col("e"), col("s.tick").as("tick"), col("s.v").as("v"), col("s.is_cur").as("is_cur"))
    val perTick = sides.join(ranged, Seq("e"))
      .where(col("tick") >= col("_rlo") && col("tick") <= col("_rhi"))
      .groupBy(col("e"), col("tick"))
      .agg(
        max(when(col("is_cur") === 1, col("v"))).as("_stc"),
        max(when(col("is_cur") === 0, col("v"))).as("_stp"))
      .where(coalesce(col("_stc"), lit(fillStatus)) =!= coalesce(col("_stp"), lit(fillStatus)))
    val keyed = bucketOf match {
      case Some(f) => perTick.groupBy(col("e"), f(col("tick")).as("_bucket"))
      case None => perTick.groupBy(col("e"))
    }
    keyed.agg(count(lit(1)).as("_disagree"))
  }

  /** Epoch tick index of a timestamp column (UTC session ⇒ lossless) —
    * floor semantics via the single shared [[graft.functions.TimeBuckets.epochIdx]]. */
  private def tickOf(ts: Column, tickSeconds: Int): Column =
    graft.functions.TimeBuckets.epochIdx(ts, tickSeconds)

  /** Episode ticks after keep-last overlap dedup (sri.R:27-39). */
  private def dedupedEpisodeTicks(
      episodes: DataFrame,
      entity: Column,
      start: Column,
      end: Column,
      status: Column,
      srcOrder: Column,
      tickSeconds: Int): DataFrame = {
    val ticks = episodes
      .select(
        entity.as("e"),
        srcOrder.as("src"),
        status.as("st"),
        explode(sequence(tickOf(start, tickSeconds), tickOf(end, tickSeconds))).as("tick"))
    // keep-last as a hash aggregate (status of the max source order) rather
    // than a row_number window: identical pick (srcOrder is the total
    // order; ties were arbitrary in both forms), but max_by PARTIALLY
    // aggregates map-side — the shuffle carries one row per (e, tick)
    // instead of every exploded episode tick, and the per-partition sort
    // the window needed disappears entirely.
    ticks
      .groupBy(col("e"), col("tick"))
      .agg(max_by(col("st"), col("src")).as("st"))
  }

  /** The literal dense-grid reference form of [[episodeSri]] (materializes
    * the per-entity tick grid, left-joins the deduped episodes, lags). Kept
    * as the executable specification the sparse form is pinned against —
    * use `episodeSri` in production. */
  private[graft] def episodeSriDense(
      episodes: DataFrame,
      entity: Column,
      start: Column,
      end: Column,
      status: Column,
      srcOrder: Column,
      tickSeconds: Int,
      lagTicks: Int,
      fillStatus: Int = 0): DataFrame = {
    val deduped = dedupedEpisodeTicks(episodes, entity, start, end, status, srcOrder, tickSeconds)
    val span = deduped.groupBy(col("e")).agg(min("tick").as("lo"), max("tick").as("hi"))
    val filled = denseTickGrid(span, tickSeconds)
      .join(deduped, Seq("e", "tick"), "left")
      .withColumn("status", coalesce(col("st"), lit(fillStatus)))
    score(filled.select(col("e"), col("tick"), col("status")), col("e"), lagTicks)
  }

  /** Active tick set + span per entity (shared by the sparse SRI forms).
    * (An e-only re-clustering of the active set was measured here and
    * REVERTED: the span branch collapses to a direct scan-side aggregate
    * today, and forcing it through the repartitioned active subtree cost
    * more than the downstream exchanges it saved at every tested scale.) */
  private def activeTicks(
      turns: DataFrame,
      entity: Column,
      ts: Column,
      tickSeconds: Int): (DataFrame, DataFrame) = {
    val active = turns
      .select(entity.as("e"), tickOf(ts, tickSeconds).as("tick"))
      .groupBy(col("e"), col("tick"))
      .agg(count(lit(1)).as("_n"))
      .select(col("e"), col("tick"))
    val span = active.groupBy(col("e")).agg(min("tick").as("lo"), max("tick").as("hi"))
    (active, span)
  }

  /** Per-entity DISAGREEMENT counts over the compared range [lo+lag, hi],
    * WITHOUT materializing the dense grid: with binary status (active=1,
    * gap=0), tick t disagrees with t−lag iff exactly one of t, t−lag is
    * active — so |disagree| = |A \ (A+lag)| + |(A+lag) \ A| restricted to
    * the range, two ANTI-JOINS over the ACTIVE set. O(|active|) instead of
    * the grid's O(span/tick) (13M rows → thousands at the test shape; at a
    * sparse 100 TB corpus this is the difference between scanning activity
    * and scanning time itself). If buckets are requested the counts group
    * by the tick's bucket. */
  private def sparseDisagreements(
      active: DataFrame,
      span: DataFrame,
      lagTicks: Int,
      bucketOf: Option[Column => Column]): DataFrame = {
    // the binary-activity instantiation of the shared 2-fan core: status 1
    // on active ticks, fill 0 elsewhere — a compared tick disagrees iff
    // exactly one side is active (the old anti-join pair consumed the
    // active set from four plan branches; the core uses one)
    val ranged = span.select(col("e"), (col("lo") + lagTicks).as("_rlo"), col("hi").as("_rhi"))
    lagDisagreements(active.withColumn("st", lit(1)), ranged, lagTicks,
      fillStatus = 0, bucketOf = bucketOf)
  }

  /** Bucketed variant of activityRegularity (e.g. daily/weekly SRI series):
    * per (entity, bucket-of-tick) score over the compared ticks in that
    * bucket. Sparse form — buckets with zero disagreements still emit
    * (sri=100) via an arithmetic per-bucket compared-tick count. */
  def activityRegularityBucketed(
      turns: DataFrame,
      entity: Column,
      ts: Column,
      tickSeconds: Int,
      lagTicks: Int,
      bucketSeconds: Long): DataFrame =
    activityRegularityBucketedCounts(turns, entity, ts, tickSeconds, lagTicks, bucketSeconds)
      .select(col("conv_id"), col("bucket_start"),
        (lit(200.0) * (col("cmp_ticks") - col("disagree")) / col("cmp_ticks") - 100.0).as("sri"))

  /** [[activityRegularityBucketed]] with the underlying EXACT INTEGER
    * counts exposed instead of the derived float score: per (entity,
    * bucket) the number of compared ticks (`cmp_ticks`) and of lag
    * disagreements (`disagree`). Callers that need bit-stable downstream
    * arithmetic (integer-domain sliding stats, cross-engine oracles)
    * derive their own score from these integers — any fixed FP op sequence
    * over them is deterministic in every engine, unlike aggregate-computed
    * floats. */
  def activityRegularityBucketedCounts(
      turns: DataFrame,
      entity: Column,
      ts: Column,
      tickSeconds: Int,
      lagTicks: Int,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds % tickSeconds == 0,
      s"bucketSeconds ($bucketSeconds) must be a multiple of tickSeconds ($tickSeconds)")
    val ticksPerBucket = bucketSeconds / tickSeconds
    val (active, span) = activeTicks(turns, entity, ts, tickSeconds)
    // every (entity, bucket) with ≥1 compared tick: bucket index range of
    // [lo+lag, hi] — a per-entity explode bounded by span/bucket (days)
    val buckets = span
      .select(col("e"), (col("lo") + lagTicks).as("_rlo"), col("hi").as("_rhi"))
      .where(col("_rlo") <= col("_rhi"))
      .select(col("e"), col("_rlo"), col("_rhi"),
        // floor-div (SQL `div` truncates toward zero — wrong bucket for
        // negative ticks, inconsistent with tickOf/bucketOf)
        explode(expr(s"sequence(cast(floor(_rlo / $ticksPerBucket.0D) as bigint), " +
          s"cast(floor(_rhi / $ticksPerBucket.0D) as bigint))")).as("_bucket"))
      // compared ticks of this bucket: overlap of the bucket's tick range
      // with [rlo, rhi] (pure arithmetic — no grid rows)
      .withColumn("_t",
        least(col("_rhi"), (col("_bucket") + 1) * ticksPerBucket - 1)
          - greatest(col("_rlo"), col("_bucket") * ticksPerBucket) + 1)
      .select(col("e"), col("_bucket"), col("_t"))
    // floor-div like tickOf: negative ticks must bucket downward, not
    // toward zero (exact: |t·tickSeconds| < 2^53, fraction ≥ 1/bucketSeconds)
    val dis = sparseDisagreements(active, span, lagTicks,
      Some(t => floor(t * tickSeconds / bucketSeconds).cast("long")))
    buckets
      .join(dis, Seq("e", "_bucket"), "left")
      .select(
        col("e").as("conv_id"),
        timestamp_seconds(col("_bucket") * ticksPerBucket * tickSeconds).as("bucket_start"),
        col("_t").as("cmp_ticks"),
        coalesce(col("_disagree"), lit(0L)).as("disagree"))
  }

  /** Transcripts instantiation: per-tick activity status (1 = at least one
    * turn in the tick) over each entity's first..last tick; day-over-day
    * regularity = lag of one day in ticks. Sparse O(|active|) form — the
    * dense status grid is never materialized (see sparseDisagreements). */
  def activityRegularity(
      turns: DataFrame,
      entity: Column,
      ts: Column,
      tickSeconds: Int,
      lagTicks: Int): DataFrame = {
    val (active, span) = activeTicks(turns, entity, ts, tickSeconds)
    val dis = sparseDisagreements(active, span, lagTicks, None)
    span
      .where(col("hi") - col("lo") >= lagTicks)
      .withColumn("_t", col("hi") - col("lo") + 1 - lagTicks)
      .join(dis, Seq("e"), "left")
      .withColumn("_d", coalesce(col("_disagree"), lit(0L)))
      .select(col("e").as("conv_id"),
        (lit(200.0) * (col("_t") - col("_d")) / col("_t") - 100.0).as("sri"))
  }
}
