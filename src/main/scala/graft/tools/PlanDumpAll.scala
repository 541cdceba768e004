package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for catalog queries to files
  * (the judge-facing plans/r06/ artifacts). Session config mirrors Bench
  * so the captured plans are the ones the bench executes. Usage:
  *   runMain graft.tools.PlanDumpAll <outDir> <suffix> [sfDir] [query...]
  * (no query names → all catalog queries). Writes <outDir>/<name>_<suffix>.txt. */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.Queries.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.Queries.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(
        Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] wrote $name")
    }
    spark.stop()
  }
}
