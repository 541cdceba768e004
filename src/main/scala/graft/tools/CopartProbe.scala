package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does HashPartitioning(conv_id) satisfy the tier aggregates'
  * ClusteredDistribution(conv_id, window), making the cascade single-shuffle? */
object CopartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the REAL bench pipeline: withMeasures (lag window shuffles by conv_id)
    // then the default cascade — how many exchanges total?
    import graft.operators.Rollup
    import graft.sources.TranscriptGen
    val turns = TranscriptGen.turns(spark, nConvs = 30L, withDuplicates = false).toDF()
    val raw = TranscriptGen.withMeasures(turns)
    val (_, _, t1d) = Rollup.cascade(raw, col("conv_id"), col("ts"), col("text_len"))
    t1d.collect()
    val p = t1d.queryExecution.executedPlan.toString
    val finalPlan = p.linesIterator.takeWhile(!_.contains("Initial Plan")).toSeq
    println("EXCHANGES=" + finalPlan.count(l => l.contains("Exchange") && !l.contains("Reused")))
    finalPlan.filter(l => l.contains("Exchange") || l.contains("Window") || l.contains("HashAggregate"))
      .foreach(l => println("PLAN " + l.trim.take(130)))
    spark.stop()
  }
}
