package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print a catalog query's executed-plan node histogram + plan.
  * Usage: runMain graft.tools.PlanDump <queryName> [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.queries(name)(spark, dir)
    df.write.mode("overwrite").format("noop").save() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    val interesting = Seq("Scan parquet", "Exchange", "ReusedExchange", "Generate ",
      "Window", "Sort ", "HashAggregate", "SortMergeJoin", "BroadcastHashJoin", "Cartesian")
    interesting.foreach { k =>
      val n = p.linesIterator.count(_.contains(k))
      if (n > 0) println(f"[plan] $name: $k%-18s x$n")
    }
    if (args.length > 2 && args(2) == "full") println(p)
    spark.stop()
  }
}
