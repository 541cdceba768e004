package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: split q_ann_ivf-style cost into the eager Lloyd phase
  * (ivfParts: seed collect + iteration collects) vs the final verify job.
  * Usage: runMain graft.tools.IvfProbe [sfDir] [runs] */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-ivf-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up like Bench
    spark.read.parquet(s"$dir/events.parquet").write.mode("overwrite").format("noop").save()
    (1 to runs).foreach { i =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
      val t0 = System.nanoTime()
      val parts = graft.operators.Similarity.ivfParts(
        emb, col("vec_id"), col("embedding"), nLists = 32, nProbe = 32, lloydIters = 3)
      val t1 = System.nanoTime()
      val (_, indexed, probed) = parts
      probed.join(indexed, Seq("list"))
        .where(col("vec_id") =!= col("neighbour_id"))
        .select(col("vec_id"), col("neighbour_id"),
          graft.plans.CosineSim.cosineSim(col("e_a"), col("e_b")).as("sim"))
        .write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      println(f"[ivf] run$i lloyd=${(t1 - t0) / 1e9}%.3f s verify=${(t2 - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
