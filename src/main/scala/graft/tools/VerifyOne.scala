package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump ONE catalog query's result + oracle SQL in the Verify
  * layout so tools/oracle_check.py can validate it in isolation (full
  * Verify runs all ~50 queries; iterating on one shouldn't pay that).
  * Usage: runMain graft.tools.VerifyOne <name>[,<name>...] [sfDir] [outDir] */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/graft_verify_one"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    graft.Verify.writeOracleJson(outDir,
      graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1)))
    spark.stop()
  }
}
