package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Rollup
import graft.sources.TranscriptGen

/** Dev probe: default (3-shuffle, map-side combine) vs co-partitioned
  * (1-shuffle) cascade at two core counts. */
object CascadeModesProbe {
  def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN"); s
  }

  def run(spark: SparkSession, path: String, copart: Boolean): Double = {
    val raw = TranscriptGen.withMeasures(spark.read.parquet(path))
    val t0 = System.nanoTime()
    val (_, _, t1d) =
      if (copart) Rollup.cascadeCoPartitioned(raw, col("conv_id"), col("ts"), col("text_len"))
      else Rollup.cascade(raw, col("conv_id"), col("ts"), col("text_len"))
    require(t1d.count() > 0)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val path = "/tmp/graft_bench_turns_80000"
    for (cores <- Seq(8, 2); copart <- Seq(false, true)) {
      val s = session(cores)
      val times = (1 to 3).map { _ => System.gc(); run(s, path, copart) }
      println(f"MODE local[$cores] copart=$copart: min=${times.min}%.2f  (${times.map(t => f"$t%.2f").mkString(", ")})")
      s.stop()
    }
  }
}
