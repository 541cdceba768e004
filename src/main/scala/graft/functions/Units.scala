package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unit-standardization registry — the engine form of the reference's
  * standardize_units.R (/root/reference/standardize_units.R:15-42): a
  * column-name-keyed set of rescale rules applied IFF the column exists in
  * the frame (the reference's `if('SleepStartTime' %in% colnames(df))`
  * pattern), so one ruleset standardizes every egress table regardless of
  * which measure columns it carries.
  *
  * All pure Column arithmetic (applied at finalize — no extra scan or
  * shuffle; the rescale rides whatever projection already runs). */
object Units {

  /** Time-unit ladder in seconds. */
  val factors: Map[String, Double] = Map(
    "us" -> 1e-6,
    "ms" -> 1e-3,
    "s" -> 1.0,
    "min" -> 60.0,
    "h" -> 3600.0,
    "d" -> 86400.0)

  /** Rescale `c` from unit `from` to unit `to` (one multiply — the factor
    * ratio is a compile-time double, so engines computing `x * (f_from /
    * f_to)` agree bit-for-bit). */
  def convert(c: Column, from: String, to: String): Column = {
    require(factors.contains(from) && factors.contains(to),
      s"unknown unit in $from -> $to; registered: ${factors.keys.toSeq.sorted.mkString(", ")}")
    c * lit(factors(from) / factors(to))
  }

  /** Apply per-column rules to the columns that EXIST in df (reference
    * column-presence-conditional semantics); absent keys are skipped. */
  def standardize(df: DataFrame, rules: Map[String, Column => Column]): DataFrame =
    rules.foldLeft(df) { case (d, (name, f)) =>
      if (d.columns.contains(name)) d.withColumn(name, f(col(name))) else d
    }

  /** standardize() with declarative (from, to) unit metadata per column —
    * the "unit registry on metric defs" form (SURVEY.md §7.0). */
  def standardizeByUnits(df: DataFrame, colUnits: Map[String, (String, String)]): DataFrame =
    standardize(df, colUnits.map { case (name, (from, to)) =>
      name -> ((c: Column) => convert(c, from, to))
    })

  /** The reference's own ruleset (standardize_units.R:20-42): sleep times
    * hrs→min, REM-onset latency sec→min, duration SD ms→min. */
  val sleepRules: Map[String, (String, String)] = Map(
    "SleepStartTime" -> ("h", "min"),
    "SleepEndTime" -> ("h", "min"),
    "MidSleep" -> ("h", "min"),
    "remOnsetLatency" -> ("s", "min"),
    "duration_sd" -> ("ms", "min"))
}
