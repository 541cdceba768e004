package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Continuous-aggregate tier cascade: raw → 1m → 1h → 1d.
  *
  * Replaces the reference's re-scan-per-timescale pattern
  * (/root/reference/scripts/sleepSD.R:52-266 computes daily / weekly /
  * sliding / all-time each from raw) with tier-on-tier partial merges.
  * Every stat in the block is associatively mergeable, so
  * rollup(raw→1d) ≡ merge(merge(raw→1m)→1h)→1d exactly (property-tested).
  *
  * Block columns (see graft.model.TierRow):
  *   n_rows, n_vals, sum, sum_sq, min, max, sum_sin, sum_cos
  * Finalizers derive mean / var_samp / stddev_samp / circular mean / circular
  * SD from the block — matching the reference aggregates A2-A6, A9, A10
  * (/root/reference/scripts/functions/calcMetrics.R:71-93,
  * /root/reference/scripts/daily-measures.R:215-222,
  * /root/reference/scripts/sleepSD.R:61).
  *
  * Scale notes (100 TB / 10^12 turns):
  *   - raw→1m is one hash aggregate; partial (map-side) aggregation means
  *     the shuffle carries one block per (conv_id, bucket) per task, not raw
  *     rows.
  *   - each coarser tier aggregates the PREVIOUS tier (×60 / ×24 smaller),
  *     so the cascade cost is dominated by raw→1m; never re-scan raw.
  *   - heavy conv_ids are handled by `Skew.saltedRollup` (same block merge
  *     over (conv_id, salt) sub-keys).
  */
object Rollup {

  /** Period (hours) of the circular domain: time-of-day on a 24h circle,
    * as psych::circadian.mean (/root/reference/scripts/daily-measures.R:215). */
  val CircularPeriodHours = 24.0

  /** Time-of-day of a timestamp in decimal hours — the reference's
    * `(hms(format(ts,...))/hours(24))*24` transform
    * (/root/reference/scripts/daily-measures.R:66-71). */
  def todHours(ts: Column): Column =
    (hour(ts) * 3600 + minute(ts) * 60 + second(ts)) / 3600.0

  /** Stat-block aggregate exprs over a measure column. NaN is normalized to
    * null BEFORE accumulation (reference na_if(., NaN),
    * /root/reference/scripts/daily-measures.R:225). `circular` is the column
    * whose circular stats we track (e.g. time-of-day hours). */
  private[graft] def blockAggs(value: Column, circular: Column): Seq[Column] = {
    val v = nanvl(value, lit(null))
    val theta = circular * lit(2.0 * math.Pi / CircularPeriodHours)
    Seq(
      count(lit(1)).as("n_rows"),
      count(v).as("n_vals"),
      coalesce(sum(v), lit(0.0)).as("sum"),
      coalesce(sum(v * v), lit(0.0)).as("sum_sq"),
      min(v).as("min"),
      max(v).as("max"),
      coalesce(sum(sin(theta)), lit(0.0)).as("sum_sin"),
      coalesce(sum(cos(theta)), lit(0.0)).as("sum_cos"))
  }

  /** raw → tier: one hash aggregate keyed (entity, event-time bucket).
    * `interval` e.g. "1 minute", "1 hour", "1 day". */
  def rollupRaw(
      raw: DataFrame,
      entity: Column,
      ts: Column,
      value: Column,
      interval: String): DataFrame =
    rollupRawKeyed(raw, entity, ts, value, interval, Nil)

  /** rollupRaw with extra grouping keys (e.g. a salt column — see Skew). */
  private[graft] def rollupRawKeyed(
      raw: DataFrame,
      entity: Column,
      ts: Column,
      value: Column,
      interval: String,
      extraKeys: Seq[Column]): DataFrame = {
    val aggs = blockAggs(value, todHours(ts))
    raw
      .groupBy(entity.as("conv_id") +: window(ts, interval).as("w") +: extraKeys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_start", col("w.start"))
      .drop("w")
  }

  /** rollupRaw + a Gorilla block of each bucket's raw (ts µs, value) points
    * in the SAME aggregate — one scan, one shuffle, and no stat/gorilla
    * join (the gorilla UDAF skips null/NaN rows itself, so the stat counts
    * and the block see the same input rows). The aggregate runs as
    * ObjectHashAggregate (typed buffer) with partial+final phases. */
  def rollupRawWithGorilla(
      raw: DataFrame,
      entity: Column,
      ts: Column,
      value: Column,
      interval: String): DataFrame = {
    val aggs = blockAggs(value, todHours(ts)) :+
      graft.functions.GorillaAgg
        .gorillaBlock(unix_micros(ts.cast("timestamp")), value.cast("double"))
        .as("gblock")
    raw
      .groupBy(entity.as("conv_id"), window(ts, interval).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_start", col("w.start"))
      .drop("w")
  }

  /** Tier merge + a Gorilla block of the CHILD tier's (bucket µs, sum)
    * series per coarse bucket — each level exactly reconstructable one
    * level down, still one aggregate (see rollupRawWithGorilla). */
  def rollupTierWithGorilla(tier: DataFrame, interval: String): DataFrame = {
    val aggs = mergeAggs :+
      graft.functions.GorillaAgg
        .gorillaBlock(unix_micros(col("bucket_start").cast("timestamp")), col("sum"))
        .as("gblock")
    tier
      .groupBy(col("conv_id"), window(col("bucket_start"), interval).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_start", col("w.start"))
      .drop("w")
  }

  /** tier → coarser tier: pure block merge — no raw data touched. */
  def rollupTier(tier: DataFrame, interval: String): DataFrame = {
    tier
      .groupBy(col("conv_id"), window(col("bucket_start"), interval).as("w"))
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .withColumn("bucket_start", col("w.start"))
      .drop("w")
  }

  /** tier → arbitrary bucket expression (e.g. Monday/Sunday week anchors,
    * TimeBuckets.weekMonday/weekSunday — reference floor_date weeks,
    * /root/reference/scripts/sleepSD.R:59 vs weekly-cardio-measures.R:49). */
  def rollupTierBy(tier: DataFrame, bucket: Column): DataFrame = {
    tier
      .groupBy(col("conv_id"), bucket.as("bucket_start"))
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** raw → all-time per-entity block (reference all-time summaries,
    * /root/reference/scripts/sleepSD.R:196-214). */
  def rollupAllTime(raw: DataFrame, entity: Column, ts: Column, value: Column): DataFrame = {
    val aggs = blockAggs(value, todHours(ts))
    raw.groupBy(entity.as("conv_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** The associative merge of stat blocks (also used by salted partials). */
  def mergeAggs: Seq[Column] = Seq(
    sum("n_rows").as("n_rows"),
    sum("n_vals").as("n_vals"),
    sum("sum").as("sum"),
    sum("sum_sq").as("sum_sq"),
    min("min").as("min"),
    max("max").as("max"),
    sum("sum_sin").as("sum_sin"),
    sum("sum_cos").as("sum_cos"))

  /** Derive user-facing measures from a block. All-null groups yield null
    * (NA-preserving semantics A8, /root/reference/scripts/weekly-cardio-measures.R:26-40). */
  def finalized(tier: DataFrame): DataFrame = {
    val n = col("n_vals")
    val mean = when(n > 0, col("sum") / n)
    // var_samp from (n, Σx, Σx²); guard n>1 like stats::sd (sample, n−1);
    // clamp tiny negative FP residue but keep null for n<=1.
    val varS = when(n > 1, greatest((col("sum_sq") - col("sum") * col("sum") / n) / (n - lit(1)), lit(0.0)))
    tier
      .withColumn("mean", mean)
      .withColumn("var_samp", varS)
      .withColumn("stddev_samp", sqrt(varS))
      .withColumn("circ_mean_h", circularMeanFromSums(col("sum_sin"), col("sum_cos"), col("n_rows")))
      .withColumn("circ_sd_h", circularSdFromSums(col("sum_sin"), col("sum_cos"), col("n_rows")))
  }

  /** Circular mean in hours on [0, 24) from (Σsin, Σcos):
    * atan2(Σsin, Σcos)·P/2π mod P — psych::circadian.mean parity
    * (/root/reference/scripts/daily-measures.R:215-217). */
  def circularMeanFromSums(sumSin: Column, sumCos: Column, n: Column): Column = {
    val p = lit(CircularPeriodHours)
    val m = atan2(sumSin, sumCos) * p / lit(2.0 * math.Pi)
    when(n > 0, pmod(m, p))
  }

  /** Circular SD in hours: sqrt(−2·ln R)·P/2π where R = |Σ(e^iθ)|/n —
    * psych::circadian.sd(hours=TRUE) parity
    * (/root/reference/scripts/sleepSD.R:61). */
  def circularSdFromSums(sumSin: Column, sumCos: Column, n: Column): Column = {
    val r = sqrt(sumSin * sumSin + sumCos * sumCos) / n
    val rClamped = least(r, lit(1.0)) // FP noise can push R just above 1
    // + 0.0: at R=1 sqrt(−2·ln 1) = −0.0; normalize to +0.0 so bitwise
    // comparisons (the driver hashes raw bits) see one canonical zero.
    when(n > 0, sqrt(lit(-2.0) * log(rClamped)) * lit(CircularPeriodHours / (2.0 * math.Pi)) + lit(0.0))
  }

  /** Typed surface: Dataset[Turn] → Dataset[TierRow] per tier (the
    * north-star "typed Dataset window aggregates" API; DataFrame methods
    * remain the dynamic-schema form). */
  def rollupTurns(
      turns: org.apache.spark.sql.Dataset[graft.model.Turn],
      measure: Column,
      interval: String): org.apache.spark.sql.Dataset[graft.model.TierRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[graft.model.TierRow]
    rollupRaw(turns.toDF(), col("conv_id"), col("ts"), measure, interval).as[graft.model.TierRow]
  }

  /** Full cascade from raw: returns (tier1m, tier1h, tier1d). Callers should
    * persist tier1m if materializing all three. */
  def cascade(
      raw: DataFrame,
      entity: Column,
      ts: Column,
      value: Column): (DataFrame, DataFrame, DataFrame) = {
    val t1m = rollupRaw(raw, entity, ts, value, "1 minute")
    val t1h = rollupTier(t1m, "1 hour")
    val t1d = rollupTier(t1h, "1 day")
    (t1m, t1h, t1d)
  }

  /** Plan-picking cascade: probe the data for mega-entities (one cheap
    * hash-sampled pass, Skew.detectHeavyKeys) and choose accordingly —
    *   - heavy keys found: salted two-phase 1m aggregate (hot conv_ids
    *     spread over `salts` reducers; Skew.adaptiveSaltedRollupRaw), then
    *     tier-on-tier merges — the mega-conversation-safe shape;
    *   - none: the single-exchange co-partitioned chain (fastest when no
    *     key dominates — the common transcripts shape).
    * Results are identical mod FP summation order either way (the block
    * merge is associative; property-tested in RollupSpec). */
  def cascadeAuto(
      raw: DataFrame,
      entity: Column,
      ts: Column,
      value: Column,
      rowThreshold: Long = 5000000L,
      salts: Int = 16): (DataFrame, DataFrame, DataFrame) = {
    val heavy = Skew.detectHeavyKeys(raw, entity, ts, rowThreshold)
    if (heavy.isEmpty) cascadeCoPartitioned(raw, entity, ts, value)
    else {
      val t1m = Skew.adaptiveSaltedRollupRaw(raw, entity, ts, value, "1 minute", salts, heavy)
      val t1h = rollupTier(t1m, "1 hour")
      val t1d = rollupTier(t1h, "1 day")
      (t1m, t1h, t1d)
    }
  }

  /** Single-shuffle cascade: repartition raw by entity ONCE, then every
    * tier aggregate runs shuffle-free — HashPartitioning(entity) satisfies
    * each aggregate's ClusteredDistribution(entity, bucket) because equal
    * (entity, bucket) pairs are already co-located, and Spark's alias-aware
    * partitioning propagates it through the tier projections. The whole
    * 1m→1h→1d chain fuses into ONE whole-stage-codegen span above one
    * Exchange (asserted in PlanSpec).
    *
    * Trade-off vs `cascade`: this ships RAW rows through the single
    * shuffle (no map-side combine), while the default ships partial blocks
    * through three shuffles. When raw cardinality per 1m bucket is low
    * (~1 turn/bucket — the transcripts shape), one raw shuffle beats
    * 1m-tier-sized + two smaller shuffles; with dense buckets the default's
    * map-side combine wins. Also: per-entity co-location concentrates a
    * mega-entity in one task — prefer the salted path for extreme keys. */
  def cascadeCoPartitioned(
      raw: DataFrame,
      entity: Column,
      ts: Column,
      value: Column): (DataFrame, DataFrame, DataFrame) = {
    // project to the three needed columns BEFORE the shuffle — the single
    // exchange then carries ~(key, ts, value) instead of full raw rows
    // (e.g. the text payload), which is what makes one raw-row shuffle
    // competitive with three block shuffles.
    val pre = raw
      .select(entity.as("_e"), ts.as("_ts"), value.as("_v"))
      .repartition(col("_e"))
    val t1m = rollupRaw(pre, col("_e"), col("_ts"), col("_v"), "1 minute")
    val t1h = rollupTier(t1m, "1 hour")
    val t1d = rollupTier(t1h, "1 day")
    (t1m, t1h, t1d)
  }
}
