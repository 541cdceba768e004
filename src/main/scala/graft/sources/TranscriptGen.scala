package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Turn

/** Deterministic, fully-distributed synthetic transcripts generator.
  *
  * Every field is a pure columnar function of (conv_id, turn_idx) via
  * xxhash64 — a splittable RNG with no sequential state, so the SAME rows
  * are produced at any parallelism level and any partition count. This is
  * what lets the scaling-efficiency benchmark (local[8] vs local[32]) run on
  * an identical input without materializing it, and is the design that
  * extends to 10^12 rows on a real cluster (spark.range is embarrassingly
  * parallel; no shuffle until the first aggregate).
  *
  * Knobs mirror FIXTURES.md §1 and the reference's skew motif
  * (/root/reference/scripts/weekly-cardio-measures.R:358-359 — "Four
  * participants have above 40 Million rows each"):
  *   - nConvs conversations, mean ~meanTurns turns each
  *   - first `nMega` conversations get megaFactor× turns (heavy-key skew)
  *   - ~1% exact duplicate rows (reference distinct()-on-load,
  *     /root/reference/scripts/daily-measures.R:54-58)
  *   - event-time gaps: a 2h pause every 20 turns → empty 1m/1h buckets to
  *     exercise gap-fill (/root/reference/scripts/functions/sri.R:47-61)
  */
object TranscriptGen {

  val EpochStart = "2025-01-01 00:00:00" // UTC anchor for all synth data

  def turns(
      spark: SparkSession,
      nConvs: Long = 200L,
      meanTurns: Int = 50,
      nMega: Int = 2,
      megaFactor: Int = 100,
      withDuplicates: Boolean = true): Dataset[Turn] = {
    import spark.implicits._

    val parallelism = spark.sparkContext.defaultParallelism
    // One row per conversation; size is hash-derived (deterministic).
    val convs = spark
      .range(0L, nConvs, 1L, parallelism)
      .withColumn("conv_id", format_string("conv%08d", $"id"))
      .withColumn("h", abs(xxhash64(lit("sz"), $"conv_id")))
      .withColumn(
        "n_turns",
        when($"id" < nMega, lit(meanTurns * megaFactor))
          .otherwise(($"h" % (2 * meanTurns - 2) + 2).cast("int")))
      // Conversation start spread over ~30 days of event time.
      .withColumn("start_off_s", abs(xxhash64(lit("st"), $"conv_id")) % (30L * 86400))

    val base = convs
      .select($"conv_id", $"start_off_s", explode(sequence(lit(0), $"n_turns" - 1)).as("turn_idx"))
      // Re-spread mega-conversations across partitions: explode keeps all
      // turns of one conv in one task; a round-robin repartition here keeps
      // generation balanced (the ENGINE must still handle the skew at agg
      // time — that is the point of the salted rollup).
      .repartition(parallelism)
      .withColumn("h", abs(xxhash64($"conv_id", $"turn_idx")))
      // Monotonic event time: 37s base spacing + <25s jitter + a 2h pause
      // every 20 turns. Closed form (no window) — jitter < spacing keeps ts
      // non-decreasing in turn_idx.
      .withColumn(
        "off_s",
        $"start_off_s" + $"turn_idx" * 37L + ($"h" % 25L) + ($"turn_idx".cast("long") / 20L) * 7200L)
      .withColumn("ts", timestamp_seconds(unix_timestamp(lit(EpochStart)) + $"off_s"))
      .withColumn(
        "role",
        when($"turn_idx" % 2 === 0, lit("user"))
          .when($"h" % 5 === 0, lit("tool"))
          .otherwise(lit("assistant")))
      .withColumn(
        "tool",
        when($"role" === "tool", element_at(array(lit("search"), lit("code"), lit("browse")), ($"h" % 3 + 1).cast("int")))
          .otherwise(lit("")))
      .withColumn(
        "text",
        concat(
          lit("turn "), $"turn_idx".cast("string"), lit(" of "), $"conv_id", lit(": "),
          repeat(concat(lit("w"), ($"h" % 7).cast("string"), lit(" ")), ($"h" % 40 + 1).cast("int"))))
      .select($"conv_id", $"turn_idx".cast("int").as("turn_idx"), $"role", $"text", $"tool", $"ts")

    val withDups =
      if (!withDuplicates) base
      else base.unionAll(base.where(abs(xxhash64(lit("dup"), $"conv_id", $"turn_idx")) % 97 === 0))

    withDups.as[Turn]
  }

  /** Per-turn derived measures (SURVEY.md §7.0 metric inputs). `turn_gap_secs`
    * is null on the first turn of a conversation (exercises NA-skipping
    * aggregates); `quality` is NaN for a deterministic ~1% of rows
    * (exercises NaN→null normalization, reference
    * /root/reference/scripts/daily-measures.R:225). */
  def withMeasures(turns: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns
      .withColumn("text_len", length(col("text")).cast("double"))
      .withColumn("is_tool_call", (col("tool") =!= "").cast("double"))
      .withColumn(
        "turn_gap_secs",
        (unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w)).cast("double"))
      .withColumn(
        "quality",
        when(abs(xxhash64(lit("nan"), col("conv_id"), col("turn_idx"))) % 100 === 0, lit(Double.NaN))
          .otherwise(col("text_len") / (col("text_len") + lit(100.0))))
  }
}
