package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo; val m = si.taskMetrics
        println(f"STAGE ${si.stageId}%3d ${si.numTasks}%4d tasks run=${m.executorRunTime / 1000.0}%7.1fs " +
          f"cpu=${m.executorCpuTime / 1e9}%7.1fs records?=n/a shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%6.0fMB ${si.name.take(30)}")
      }
    })
    val df = graft.SparkEntry.queries("q_ngram_jaccard_block")(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    println("ROWS=" + df.count() + f" sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    Thread.sleep(500)
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Sort"))
      .map(_.trim.take(130)).mkString("\n"))
    spark.stop()
  }
}
