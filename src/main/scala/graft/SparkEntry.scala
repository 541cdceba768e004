package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Rollup
import graft.sources.TranscriptGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full north-star pipeline end-to-end — deterministically
    * synthesized transcripts appended to an Iceberg-shaped source table,
    * raw → 1m → 1h → 1d Gorilla-carrying tier tables built tier-on-tier,
    * retention ladder applied, finalized 1d tier returned (measures derived
    * from the mergeable stat blocks). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val turns = TranscriptGen.withMeasures(TranscriptGen.turns(spark, nConvs = 50L).toDF())
    val source = graft.sources.IceTable(s"$root/raw")
    source.append(turns, "ts")
    val tiers = graft.operators.TierStore.build(spark, source, s"$root/tiers", col("text_len"))
    val maxUs = tiers.t1d.currentLiveFiles.map(_.maxTsUs).max
    val day = 86400000000L
    graft.operators.TierStore.applyRetention(tiers, maxUs, 21 * day, 90 * day, 10000 * day)
    Rollup.finalized(tiers.t1d.scan(spark))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
