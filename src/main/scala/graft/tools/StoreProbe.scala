package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the Bench tier-store build phase (wipe + TierStore.sync
  * from the cached bench IceTable) with Bench's session config — used to
  * A/B the CheckpointedRollup day-unit batching. Usage:
  *   runMain graft.tools.StoreProbe [runs] */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-store-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srcTable = graft.sources.IceTable("/tmp/graft_bench_ice_80000")
    require(srcTable.currentSnapshotId != 0L, "run Bench once to build the cached ice table")
    val storeRoot = "/tmp/graft_store_probe"
    (1 to runs).foreach { i =>
      graft.Fs.deleteTreeQuietly(storeRoot)
      val t0 = System.nanoTime()
      graft.operators.TierStore.sync(spark, srcTable, storeRoot, col("text_len"), parallelism = 8)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[store] run$i: $sec%.1f s (${20335614 / sec}%.0f turns/s)")
    }
    spark.stop()
  }
}
