package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered-run analysis inside an entity: the engine generalization of the
  * reference's daily-measures window pipelines
  * (/root/reference/scripts/daily-measures.R:110-181):
  *   W1 NumAwakenings — count X→target transitions, excluding a trailing
  *      target run (the reference drops the last row when it is wake:
  *      daily-measures.R:117 `row_number()==n()`);
  *   W2 REM fragmentation — target→non-target transitions over target count;
  *   W4 first-match latency — seconds between the first row matching predA
  *      and the first row matching predB (cumsum(bool)==1 flags,
  *      daily-measures.R:136-160).
  *
  * All are window functions over (entity [, episode]) ordered by event time:
  * ONE shuffle on the partition keys, no driver loops — this replaces the
  * reference's per-episode R pipelines.
  */
object Episodes {

  private def w(parts: Seq[Column], order: Seq[Column]): WindowSpec =
    Window.partitionBy(parts: _*).orderBy(order: _*)

  /** W1: count transitions into `isTarget` rows, excluding a trailing
    * target run. E.g. awakenings: non-wake → wake, trailing wake dropped. */
  def transitionsInto(
      df: DataFrame,
      parts: Seq[Column],
      order: Seq[Column],
      isTarget: Column): DataFrame = {
    val ws = w(parts, order)
    // a transition row: next row is target, current is not
    val nxt = lead(isTarget.cast("int"), 1).over(ws)
    // trailing-run exclusion: a target run that extends to the group end
    // contributes no transition if nothing follows it — count transitions
    // whose target run is followed by at least one later non-target row.
    val flagged = df
      .withColumn("_cur", isTarget.cast("int"))
      .withColumn("_nxt", nxt)
      .withColumn("_rest_non_target",
        sum(when(isTarget, 0).otherwise(1)).over(
          ws.rowsBetween(1, Window.unboundedFollowing)))
    flagged
      .where(col("_cur") === 0 && col("_nxt") === 1 && col("_rest_non_target") > 0)
      .groupBy(parts: _*)
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** W2-style fragmentation: target→non-target transition count per group
    * (numerator of REM fragmentation, daily-measures.R:166-181). */
  def transitionsOutOf(
      df: DataFrame,
      parts: Seq[Column],
      order: Seq[Column],
      isTarget: Column): DataFrame = {
    val ws = w(parts, order)
    val prev = lag(isTarget.cast("int"), 1).over(ws)
    df.withColumn("_cur", isTarget.cast("int"))
      .withColumn("_prev", prev)
      .where(col("_prev") === 1 && col("_cur") === 0)
      .groupBy(parts: _*)
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** W4: latency in seconds from the first row matching `from` to the first
    * row matching `until` (null if either never matches). */
  def firstMatchLatency(
      df: DataFrame,
      parts: Seq[Column],
      ts: Column,
      from: Column,
      until: Column): DataFrame = {
    df.groupBy(parts: _*)
      .agg(
        ((min(when(until, unix_micros(ts.cast("timestamp"))))
          - min(when(from, unix_micros(ts.cast("timestamp"))))) / 1e6).as("latency_secs"))
  }

  /** Episode (maximal same-value run) identification: assigns a run id per
    * consecutive stretch of equal `value` — the building block for
    * run-length semantics (no reference analog needed it explicitly, but
    * NumAwakenings/SRI derive from it). Classic gaps-and-islands:
    * run_id = row_number − row_number within value partition. */
  def withRunId(
      df: DataFrame,
      parts: Seq[Column],
      order: Seq[Column],
      value: Column): DataFrame = {
    val all = w(parts, order)
    val byVal = w(parts :+ value, order)
    df.withColumn("_rn_all", row_number().over(all))
      .withColumn("_rn_val", row_number().over(byVal))
      .withColumn("run_key", col("_rn_all") - col("_rn_val"))
      .drop("_rn_all", "_rn_val")
  }
}
