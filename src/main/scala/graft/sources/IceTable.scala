package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal Iceberg-SHAPED table layer (not the Iceberg library — no Iceberg
  * runtime ships in this environment, SURVEY.md §7.1): a directory of
  * immutable Parquet data files plus a JSON snapshot log with per-file
  * min/max event-time stats.
  *
  * Gives the engine the three Iceberg semantics the north rule needs:
  *   1. snapshot-id LINEAGE — every append/expire records parent & op;
  *      downstream checkpoints cite the source snapshot-id they consumed;
  *   2. stat-based PRUNING — scans pass a time range and only overlapping
  *      files are read (manifest-level partition pruning; at 100 TB this is
  *      what turns an incremental tier build into an O(changed-days) scan);
  *   3. retention EXPIRY — `expireOlderThan` is a metadata-only snapshot
  *      that drops aged files from the table (Iceberg expire/rewrite
  *      analog of the reference's post-infection retention filters,
  *      /root/reference/scripts/sleepSD.R:216,226).
  *
  * Layout: root/data/snap-<id>/part-*.parquet, root/snapshots/v<id>.json,
  * root/CURRENT (text file with latest id; updated via atomic rename).
  * Provenance parity: the reference records executed=/used= lineage on
  * every egress (/root/reference/scripts/daily-measures.R:242-251) — here
  * it is the snapshot log itself.
  */
final class IceTable(val root: String) {
  private val mapper = new ObjectMapper()
  private def snapDir: Path = Paths.get(root, "snapshots")
  private def currentFile: Path = Paths.get(root, "CURRENT")

  case class FileEntry(path: String, rows: Long, bytes: Long, minTsUs: Long, maxTsUs: Long)
  case class Snapshot(id: Long, parentId: Long, op: String, files: Seq[FileEntry])

  def currentSnapshotId: Long =
    if (Files.exists(currentFile)) new String(Files.readAllBytes(currentFile), StandardCharsets.UTF_8).trim.toLong
    else 0L

  def snapshot(id: Long): Option[Snapshot] = {
    val p = snapDir.resolve(f"v$id%05d.json")
    if (!Files.exists(p)) None
    else {
      val n = mapper.readTree(Files.readAllBytes(p))
      val files = n.get("files").elements().asScala.map { f =>
        FileEntry(f.get("path").asText, f.get("rows").asLong, f.get("bytes").asLong,
          f.get("min_ts_us").asLong, f.get("max_ts_us").asLong)
      }.toSeq
      Some(Snapshot(n.get("id").asLong, n.get("parent_id").asLong, n.get("op").asText, files))
    }
  }

  def current: Option[Snapshot] = snapshot(currentSnapshotId)

  private def writeSnapshot(s: Snapshot): Unit = {
    Files.createDirectories(snapDir)
    val node: ObjectNode = mapper.createObjectNode()
    node.put("id", s.id)
    node.put("parent_id", s.parentId)
    node.put("op", s.op)
    val arr: ArrayNode = node.putArray("files")
    s.files.foreach { f =>
      val fn = arr.addObject()
      fn.put("path", f.path); fn.put("rows", f.rows); fn.put("bytes", f.bytes)
      fn.put("min_ts_us", f.minTsUs); fn.put("max_ts_us", f.maxTsUs)
    }
    Files.write(snapDir.resolve(f"v${s.id}%05d.json"), mapper.writerWithDefaultPrettyPrinter.writeValueAsBytes(node))
    // commit = atomic rename of CURRENT
    val tmp = Paths.get(root, s".CURRENT.tmp${s.id}")
    Files.write(tmp, s.id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append a DataFrame as a new snapshot. `tsCol` drives per-file min/max
    * stats (collected from the written files' own footless re-scan; a real
    * deployment captures these in the commit protocol — same semantics). */
  def append(df: DataFrame, tsCol: String): Long = {
    val spark = df.sparkSession
    val id = currentSnapshotId + 1
    val dir = Paths.get(root, "data", f"snap-$id%05d").toString
    df.write.mode("errorifexists").parquet(dir)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("rows"),
        min(unix_micros(col(tsCol).cast("timestamp"))).as("lo"),
        max(unix_micros(col(tsCol).cast("timestamp"))).as("hi"))
      .collect()
    val entries = stats.map { r =>
      val uri = new java.net.URI(r.getAs[String]("f"))
      val p = Paths.get(uri.getPath)
      FileEntry(p.toString, r.getAs[Long]("rows"), Files.size(p), r.getAs[Long]("lo"), r.getAs[Long]("hi"))
    }.toSeq
    val prev = current.map(_.files).getOrElse(Nil)
    writeSnapshot(Snapshot(id, id - 1, "append", prev ++ entries))
    id
  }

  /** Scan the current snapshot, optionally pruned to files overlapping
    * [loUs, hiUs] via manifest stats (no parquet touched outside range). */
  def scan(spark: SparkSession, loUs: Long = Long.MinValue, hiUs: Long = Long.MaxValue): DataFrame = {
    val files = current.map(_.files).getOrElse(Nil)
      .filter(f => f.maxTsUs >= loUs && f.minTsUs <= hiUs)
      .map(_.path)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Retention expiry: metadata-only snapshot dropping files entirely older
    * than the cutoff. Rows in straddling files are NOT dropped here — pair
    * with a filter at read time or a rewrite; tier buckets align to file
    * boundaries in practice so straddlers are rare. Returns new snapshot id. */
  def expireOlderThan(cutoffUs: Long): Long = {
    val id = currentSnapshotId + 1
    val kept = current.map(_.files).getOrElse(Nil).filter(_.maxTsUs >= cutoffUs)
    writeSnapshot(Snapshot(id, id - 1, "expire", kept))
    id
  }

  /** Compaction rewrite: coalesce the current file set into ~`targetFiles`
    * new data files and commit as an op="rewrite" snapshot (Iceberg
    * rewriteDataFiles analog). Old files stay on disk for time travel;
    * `expireOlderThan`-style manifest pruning governs logical visibility.
    * Rows and their `tsCol` stats are preserved exactly. */
  def rewriteCompact(spark: SparkSession, tsCol: String, targetFiles: Int = 1): Long = {
    val df = scan(spark).coalesce(math.max(targetFiles, 1))
    val id = currentSnapshotId + 1
    val dir = Paths.get(root, "data", f"snap-$id%05d").toString
    df.write.mode("errorifexists").parquet(dir)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("rows"),
        min(unix_micros(col(tsCol).cast("timestamp"))).as("lo"),
        max(unix_micros(col(tsCol).cast("timestamp"))).as("hi"))
      .collect()
    val entries = stats.map { r =>
      val p = Paths.get(new java.net.URI(r.getAs[String]("f")).getPath)
      FileEntry(p.toString, r.getAs[Long]("rows"), Files.size(p), r.getAs[Long]("lo"), r.getAs[Long]("hi"))
    }.toSeq
    writeSnapshot(Snapshot(id, id - 1, "rewrite", entries))
    id
  }

  /** Total (rows, bytes) in the current snapshot — table-level metrics. */
  def metrics: (Long, Long) = {
    val fs = current.map(_.files).getOrElse(Nil)
    (fs.map(_.rows).sum, fs.map(_.bytes).sum)
  }
}

object IceTable {
  def apply(root: String): IceTable = new IceTable(root)
}
