package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev measurement main: time one catalog query by name.
  * Usage: runMain graft.tools.QueryProbe <queryName> [sfDir] [runs] */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-query-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.Queries.queries(name)
    (1 to runs).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      // noop sink like Bench: count() lets Catalyst prune whole column
      // trees (it hid a 46s window stage once) — time what consumers pay
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
