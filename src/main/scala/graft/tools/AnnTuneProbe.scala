package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/latency probe for (nPlanes, bands) ANN settings. */
object AnnTuneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    // recall at sf0.001 (the spec's method, 20 sample queries)
    val emb001 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val all = emb001.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val sample = all.keys.toSeq.sorted.take(20)

    val emb01 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .repartition(spark.sparkContext.defaultParallelism)

    // measured 2026-08-16: (24,12) recall .99, sf0.1 3.2-8.8s (variance =
    // few heavy tasks; r=2 bands are 4-way so the candidate set is ~all
    // pairs — inherent on these weakly-clustered synthetic embeddings);
    // (48,8) r=6 recall collapses to .26 → selectivity is NOT free here.
    for ((np, nb) <- Seq((24, 12), (48, 8), (48, 12), (36, 9))) {
      val ann = Similarity.lshTopK(emb001, col("vec_id"), col("embedding"), k = 5, nPlanes = np, bands = nb)
        .select(col("vec_id"), col("neighbour_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = sample.map { q =>
        val exact = (all - q).map { case (i, v) => i -> cos(all(q), v) }
          .toSeq.sortBy(-_._2).take(5).map(_._1).toSet
        val got = ann.collect { case (a, b) if a == q => b }.toSet
        (exact intersect got).size.toDouble / 5.0
      }.sum / sample.size
      // timing at sf0.1: 3 reps
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Similarity.lshTopK(emb01, col("vec_id"), col("embedding"), k = 5, nPlanes = np, bands = nb).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ANNTUNE planes=$np bands=$nb r=${np / nb} recall=$recall%.3f sf01_secs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
