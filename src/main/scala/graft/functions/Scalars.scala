package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column semantics lifted from the reference scripts — all pure
  * `Column` expressions (the reference used rowwise() R closures only
  * because R; none of these needs a UDF, SURVEY.md §2.9/§2.11). */
object Scalars {

  /** P4: keep rows where ANY of the columns is a non-empty string
    * (/root/reference/scripts/daily-measures.R:113,132,169). */
  def anyNonEmpty(cols: Seq[Column]): Column =
    cols.map(c => c.isNotNull && c =!= "").reduce(_ || _)

  /** P5: out-of-range values become NULL, row kept (QC rules,
    * /root/reference/scripts/weekly-cardio-measures.R:318-330). */
  def qcRange(c: Column, lo: Double, hi: Double): Column =
    when(c >= lo && c <= hi, c)

  /** P8: conditional masking — value only when the flag holds
    * (/root/reference/scripts/daily-measures.R:64-65). */
  def maskUnless(c: Column, flag: Column): Column = when(flag, c)

  /** CardioScore "30-34" range string → mean of endpoints
    * (/root/reference/scripts/weekly-cardio-measures.R:13-22). Single
    * values ("42") pass through as doubles. */
  def rangeMean(c: Column): Column = {
    val parts = split(c, "-")
    when(size(parts) === 2,
      (element_at(parts, 1).cast("double") + element_at(parts, 2).cast("double")) / 2.0)
      .otherwise(c.cast("double"))
  }

  /** Sleep-efficiency expression, branch-heavy but UDF-free
    * (/root/reference/scripts/daily-measures.R:20-49): classic =
    * (asleep+restless)/(awake+asleep+restless); stages =
    * (light+deep+rem)/(light+deep+rem+wake); rounded ×100. NULL level
    * fields propagate (use [[efficiencyPct]] for the reference's
    * na.rm-sum semantics). */
  def efficiency(
      typ: Column,
      awake: Column, asleep: Column, restless: Column,
      light: Column, deep: Column, rem: Column, wake: Column): Column = {
    val classic = (asleep + restless) / (awake + asleep + restless)
    val stages = (light + deep + rem) / (light + deep + rem + wake)
    round(lit(100.0) * when(typ === "classic", classic).when(typ === "stages", stages), 0)
  }

  /** getSleepEfficiency with the reference's FULL semantics
    * (/root/reference/scripts/weekly-sleep-efficiencies.R:20-50), for
    * INTEGRAL level fields: the level sums are R's `sum(..., na.rm=T)`
    * (NA contributes 0, all-NA sums to 0), and the `round(100*x)` is done
    * in EXACT integer arithmetic with R's OWN tie rule — IEC-60559
    * round-half-to-EVEN, which R's round() applies and which differs from
    * Spark/DuckDB round() (half-away-from-zero) on every x.5 tie with an
    * even target (e.g. 100·1/40 = 2.5 → R gives 2). Ties are detected
    * exactly ((200·num) mod (2·den) = den) and resolved to the even
    * neighbour; non-ties use floor((200·num + den)/(2·den)) = round. So
    * the result is both faithful to the reference AND deterministic in
    * every engine (.5 ties are common with small integer level minutes).
    * A zero denominator (all levels NA) yields NULL, the
    * aggregation-level analog of R's 0/0 NaN being dropped by the weekly
    * na.rm mean; an unknown Type yields NULL (R's `ifelse(Type %in% ...,
    * x, NA)`). The double-route floor-divs are exact for any plausible
    * minute counts (numerators < 2^53, fractional parts ≥ 1/(2·den) dwarf
    * the divisions' rounding error). */
  def efficiencyPct(
      typ: Column,
      awake: Column, asleep: Column, restless: Column,
      light: Column, deep: Column, rem: Column, wake: Column): Column = {
    def z(c: Column) = coalesce(c.cast("long"), lit(0L))
    val numClassic = z(asleep) + z(restless)
    val denClassic = z(awake) + z(asleep) + z(restless)
    val numStages = z(light) + z(deep) + z(rem)
    val denStages = z(light) + z(deep) + z(rem) + z(wake)
    val num = when(typ === "classic", numClassic).when(typ === "stages", numStages)
    val den = when(typ === "classic", denClassic).when(typ === "stages", denStages)
    val num200 = lit(200L) * num
    // abs(): the remainder carries the DIVIDEND's sign in both engines, so
    // a negative numerator's half-tie shows up as −den, not den
    val isTie = abs(num200 % (lit(2L) * den)) === den
    val fl = floor((lit(100L) * num).cast("double") / den.cast("double")).cast("long")
    val rnd = floor((num200 + den).cast("double") / (lit(2L) * den).cast("double")).cast("long")
    when(den > 0,
      when(isTie, when(fl % 2 === 0, fl).otherwise(fl + 1)).otherwise(rnd))
  }

  /** Between8and2: time-of-day in [20:00, 24:00) ∪ [00:00, 02:00]
    * (/root/reference/scripts/percentSleepStartIn8pm2am.R:29). */
  def between8pm2am(ts: Column): Column = {
    val h = graft.operators.Rollup.todHours(ts)
    h >= 20.0 || h <= 2.0
  }

  /** Weekday label (reference wday(label=TRUE),
    * /root/reference/scripts/daily-measures.R:234). */
  def weekdayLabel(d: Column): Column = date_format(d, "EEEE")

  /** P9: NaN→NULL across the given numeric columns, returning the exprs
    * (/root/reference/scripts/daily-measures.R:225). */
  def nanToNull(c: Column): Column = nanvl(c, lit(null))
}
