package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Rollup
import graft.sources.TranscriptGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full raw → 1m → 1h → 1d continuous-aggregate cascade over a
    * deterministically synthesized transcripts table (BASELINE.json
    * north_star), finalized 1d tier returned. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val turns = TranscriptGen.turns(spark, nConvs = 50L)
    val measured = TranscriptGen.withMeasures(turns.toDF)
    val (_, _, t1d) = Rollup.cascade(measured, col("conv_id"), col("ts"), col("text_len"))
    Rollup.finalized(t1d)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
