package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.IceTable

/** Resumable tier build: raw IceTable → 1m-tier parquet, one event-time DAY
  * per work unit, each unit committed with a lineage-carrying checkpoint.
  *
  * Checkpoint JSON per day: {source_snapshot_id, bucket_lo_us, bucket_hi_us,
  * rows, bytes, wall_ms} — exactly the north rule's "per-partition
  * checkpoints carrying lineage (source snapshot-id, bucket range) and
  * row/byte metrics", and the engine analog of the reference's
  * executed=/used= provenance on every egress
  * (/root/reference/scripts/daily-measures.R:242-251).
  *
  * Resume semantics: a day is skipped iff its marker exists AND its
  * source-file FINGERPRINT is unchanged — the fingerprint hashes the
  * manifest entries (path, rows, bytes) of exactly the files overlapping
  * that day. Appending a new snapshot therefore invalidates ONLY the days
  * the new files touch (incremental tier build: O(changed days), not
  * O(history)); a crashed run redoes only missing days. The marker also
  * records the source snapshot id for lineage/audit. Output commit is
  * write-to-temp + atomic rename, so a kill mid-day never leaves a
  * half-visible day.
  *
  * Scale: each day scans ONLY the raw files overlapping that day (IceTable
  * stat pruning). On a 1000-executor cluster work units are submitted as
  * independent jobs (optionally concurrently); within a unit the rollup is
  * the ordinary distributed hash aggregate.
  */
object CheckpointedRollup {

  private val mapper = new ObjectMapper()
  private val DayUs = 86400000000L

  final case class DayResult(dayUs: Long, rows: Long, bytes: Long, skipped: Boolean)

  /** Distinct event-time days present in the source manifest (metadata only). */
  def pendingDays(source: IceTable): Seq[Long] = {
    val files = source.current.map(_.files).getOrElse(Nil)
    files
      .flatMap(f => (f.minTsUs / DayUs) to (f.maxTsUs / DayUs))
      .distinct
      .sorted
      .map(_ * DayUs)
  }

  private def markerPath(outDir: String, dayUs: Long) =
    Paths.get(outDir, "_checkpoints", s"day-$dayUs.json")

  /** Deterministic fingerprint of the source files overlapping a day. */
  def dayFingerprint(source: IceTable, dayUs: Long): Long = {
    val files = source.current.map(_.files).getOrElse(Nil)
      .filter(f => f.maxTsUs >= dayUs && f.minTsUs < dayUs + DayUs)
      .sortBy(_.path)
    files.foldLeft(1125899906842597L) { (h, f) =>
      ((h * 31 + f.path.hashCode) * 31 + f.rows) * 31 + f.bytes
    }
  }

  def isDone(outDir: String, dayUs: Long, fingerprint: Long): Boolean = {
    val p = markerPath(outDir, dayUs)
    Files.exists(p) && {
      val n = mapper.readTree(Files.readAllBytes(p))
      n.has("source_files_fp") && n.get("source_files_fp").asLong == fingerprint
    }
  }

  /** Run (or resume) the tier build. `failAfter` injects a crash after N
    * completed units — used by the resume tests. Returns per-day results. */
  def run(
      spark: SparkSession,
      source: IceTable,
      outDir: String,
      value: Column,
      interval: String = "1 minute",
      failAfter: Option[Int] = None): Seq[DayResult] = {
    val snapId = source.currentSnapshotId
    Files.createDirectories(Paths.get(outDir, "_checkpoints"))
    var done = 0
    pendingDays(source).map { dayUs =>
      val fp = dayFingerprint(source, dayUs)
      if (isDone(outDir, dayUs, fp)) DayResult(dayUs, 0L, 0L, skipped = true)
      else {
        failAfter.foreach(k => if (done >= k) throw new RuntimeException(s"injected failure after $k units"))
        val t0 = System.nanoTime()
        val raw = source
          .scan(spark, dayUs, dayUs + DayUs - 1)
          .where(col("ts") >= timestamp_micros(lit(dayUs)) && col("ts") < timestamp_micros(lit(dayUs + DayUs)))
        val tier = Rollup.rollupRaw(raw, col("conv_id"), col("ts"), value, interval)
        val dayDir = Paths.get(outDir, s"day=$dayUs")
        val tmpDir = Paths.get(outDir, s".day-$dayUs.tmp")
        if (Files.exists(tmpDir)) deleteRec(tmpDir)
        tier.write.mode("overwrite").parquet(tmpDir.toString)
        if (Files.exists(dayDir)) deleteRec(dayDir)
        Files.move(tmpDir, dayDir, StandardCopyOption.ATOMIC_MOVE)
        val rows = spark.read.parquet(dayDir.toString).count()
        val bytes = dirBytes(dayDir)
        val node = mapper.createObjectNode()
        node.put("source_snapshot_id", snapId)
        node.put("source_files_fp", fp)
        node.put("bucket_lo_us", dayUs)
        node.put("bucket_hi_us", dayUs + DayUs - 1)
        node.put("rows", rows)
        node.put("bytes", bytes)
        node.put("wall_ms", (System.nanoTime() - t0) / 1000000)
        val tmp = Paths.get(outDir, "_checkpoints", s".day-$dayUs.tmp")
        Files.write(tmp, mapper.writeValueAsBytes(node))
        Files.move(tmp, markerPath(outDir, dayUs), StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        done += 1
        DayResult(dayUs, rows, bytes, skipped = false)
      }
    }
  }

  private def deleteRec(p: java.nio.file.Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder()).forEach(Files.delete(_))
    finally s.close()
  }

  private def dirBytes(p: java.nio.file.Path): Long = {
    val s = Files.walk(p)
    try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum
    finally s.close()
  }
}
