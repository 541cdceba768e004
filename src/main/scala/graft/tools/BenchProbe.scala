package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Rollup
import graft.sources.TranscriptGen

/** Dev probe: stage-level diagnosis of cascade scaling. */
object BenchProbe {

  class StageLog extends SparkListener {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val m = si.taskMetrics
      lines += f"    stage ${si.stageId}%3d ${si.numTasks}%4d tasks " +
        f"run=${m.executorRunTime / 1000.0}%8.1fs cpu=${m.executorCpuTime / 1e9}%8.1fs " +
        f"gc=${m.jvmGCTime / 1000.0}%6.1fs spill=${m.memoryBytesSpilled / 1e6}%8.0fMB " +
        f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.0fMB ${si.name.take(40)}"
    }
  }

  def session(cores: Int, aqe: Boolean, parts: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def cascade(spark: SparkSession, path: String, heavy: Boolean): Double = {
    import graft.functions.TextFunctions
    val base = TranscriptGen.withMeasures(spark.read.parquet(path))
    val raw = if (!heavy) base else base
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")).cast("double"))
      .withColumn("quality2", TextFunctions.qualityScore(col("text")))
    val t0 = System.nanoTime()
    val v = if (heavy) col("n_tokens") else col("text_len")
    val (_, _, t1d) = Rollup.cascade(raw, col("conv_id"), col("ts"), v)
    require(t1d.count() > 0)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val path = "/tmp/graft_bench_turns_20000"
    val heavy = args.contains("-heavy")
    for ((cores, aqe, parts) <- Seq((8, true, 8), (2, true, 2), (8, true, 8), (2, true, 2))) {
      val s = session(cores, aqe, parts)
      val log = new StageLog
      s.sparkContext.addSparkListener(log)
      val times = (1 to 3).map { _ => System.gc(); cascade(s, path, heavy) }
      println(f"local[$cores] aqe=$aqe parts=$parts heavy=$heavy: ${times.map(t => f"$t%.2f").mkString(", ")}")
      Thread.sleep(500)
      if (args.contains("-v")) log.lines.foreach(println)
      s.stop()
    }
  }
}
