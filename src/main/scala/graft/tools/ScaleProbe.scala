package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Rollup
import graft.sources.TranscriptGen

/** Dev probe: cascade throughput at several core counts on the cached bench
  * input — used to pick the scaling pair (N, 4N) that stays inside the
  * single-box DRAM-bandwidth envelope. */
object ScaleProbe {
  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"scale-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN"); s
  }
  def main(args: Array[String]): Unit = {
    val inputPath = "/tmp/graft_bench_turns_80000"
    val levels = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val nRuns = 3
    val out = scala.collection.mutable.Map[Int, Double]()
    for (pass <- 1 to 2; k <- levels.reverse) {
      val spark = session(k)
      val raw = TranscriptGen.withMeasures(spark.read.parquet(inputPath))
      val best = (1 to nRuns).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val (_, _, t1d) = Rollup.cascadeCoPartitioned(raw, col("conv_id"), col("ts"), col("text_len"))
        require(t1d.count() > 0)
        (System.nanoTime() - t0) / 1e9
      }.min
      out(k) = math.min(out.getOrElse(k, Double.MaxValue), best)
      println(f"[scale] pass$pass cores=$k best=${out(k)}%.2f s")
      spark.stop()
    }
    val n = 20335614.0
    levels.foreach(k => println(f"[scale] cores=$k thr=${n / out(k)}%.0f turns/s"))
    for (Seq(a, b) <- levels.sliding(2).toSeq if out.contains(a) && out.contains(b)) ()
    println(f"[scale] eff 1->4 = ${(n/out.getOrElse(4, 1.0))/(n/out.getOrElse(1, 1.0))/4.0}%.3f")
    println(f"[scale] eff 2->8 = ${(n/out.getOrElse(8, 1.0))/(n/out.getOrElse(2, 1.0))/4.0}%.3f")
  }
}
