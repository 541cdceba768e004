package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement: IVF recall@5 + candidate fraction across
  * (nLists, nProbe, lloydIters) on the sf0.001 embeddings. */
object IvfTuneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val n = emb.count().toDouble
    val all = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val sample = all.keys.toSeq.sorted.take(60)
    val exact = sample.map { q =>
      q -> (all - q).map { case (i, v) => i -> cos(all(q), v) }
        .toSeq.sortBy(-_._2).take(5).map(_._1).toSet
    }.toMap
    for (l <- Seq(32); p <- Seq(18, 20, 22); it <- Seq(3)) {
      val ann = graft.operators.Similarity
        .ivfTopK(emb, $"vec_id", $"embedding", k = 5, nLists = l, nProbe = p, lloydIters = it)
        .select($"vec_id", $"neighbour_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = sample.map { q =>
        (exact(q) intersect ann.collect { case (a, b) if a == q => b }.toSet).size / 5.0
      }.sum / sample.size
      val (_, indexed, probed) = graft.operators.Similarity
        .ivfParts(emb, $"vec_id", $"embedding", l, p, it)
      val sizes = indexed.groupBy($"list").count().collect()
        .map(r => r.getAs[Int]("list") -> r.getAs[Long]("count")).toMap
      val cand = probed.collect().map(r => sizes.getOrElse(r.getAs[Int]("list"), 0L)).sum.toDouble
      println(f"[ivf] L=$l%3d P=$p%3d iters=$it: recall@5=$recall%.3f candFrac=${cand / (n * n)}%.3f maxList=${sizes.values.max}")
    }
    spark.stop()
  }
}
