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
    // the action must run THROUGH this Dataset's own QueryExecution (a
    // df.write would build a fresh one, leaving THIS plan un-executed and
    // the AQE-final shape — reuse, coalesced exchanges — invisible); then
    // read only the final-plan section
    df.foreach(_ => ())
    val p = df.queryExecution.executedPlan.toString
      .linesIterator.takeWhile(!_.contains("Initial Plan")).mkString("\n")
    val interesting = Seq("Scan parquet", "Exchange", "ReusedExchange", "Generate ",
      "Window", "Sort ", "HashAggregate", "SortMergeJoin", "BroadcastHashJoin", "Cartesian")
    interesting.foreach { k =>
      val n =
        if (k == "Exchange") p.linesIterator.count(l => l.contains(k) && !l.contains("Reused"))
        else p.linesIterator.count(_.contains(k))
      if (n > 0) println(f"[plan] $name: $k%-18s x$n")
    }
    if (args.length > 2 && args(2) == "full") println(p)
    spark.stop()
  }
}
