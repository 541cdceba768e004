package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time individual SparkEntry queries. Usage:
  * runMain graft.tools.QueryTime <sfDir> <query...> */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"TIMING $q rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
