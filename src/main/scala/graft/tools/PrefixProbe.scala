package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage cost probe for the prefix-filtered Jaccard join. */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val sh = Dedup.wordShingles(col("text"), 3)
    for (_ <- 1 to 2) {
      val hashed = sort_array(transform(sh, s => xxhash64(s)))
      val base = docs.select(col("doc_id").as("id"), hashed.as("sh"))
        .withColumn("n", size(col("sh")))
      time("base+shingle")(base.agg(sum(col("n"))).head())
      val tok = base.select(col("id"), col("n"), explode(col("sh")).as("t"))
      time("tok explode")(println("  tok=" + tok.count()))
      val dfreq = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))
      time("dfreq")(println("  distinct toks=" + dfreq.count()))
      import org.apache.spark.sql.expressions.Window
      val p = (col("n") - floor(lit(0.35) * col("n"))).cast("int") + 1
      val prefix = tok.join(dfreq, Seq("t"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("id")).orderBy(col("df"), col("t"))))
        .where(col("rn") <= p)
      time("prefix")(println("  prefix rows=" + prefix.count()))
      val a = prefix.select(col("t"), col("id").as("id_a"), col("n").as("n_a"), col("rn").as("rn_a"))
      val b = prefix.select(col("t").as("t_b"), col("id").as("id_b"), col("n").as("n_b"), col("rn").as("rn_b"))
      val bound = (lit(1) + least(col("n_a") - col("rn_a"), col("n_b") - col("rn_b"))).cast("double") >=
        lit(0.35 / 1.35) * (col("n_a") + col("n_b"))
      val pairs = a.join(b,
          col("t") === col("t_b") && col("id_a") < col("id_b") &&
            least(col("n_a"), col("n_b")).cast("double") / greatest(col("n_a"), col("n_b")) >= 0.35 && bound)
        .select(col("id_a"), col("id_b"))
      time("pair join (pre-distinct)")(println("  cand rows=" + pairs.count()))
      val dp = pairs.distinct()
      time("pair distinct")(println("  cand pairs=" + dp.count()))
      val verified = dp
        .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .select(graft.plans.SetOps.sortedJaccard(col("sh_a"), col("sh_b")).as("j"))
        .where(col("j") >= 0.35)
      time("verify")(println("  final=" + verified.count()))
    }
    spark.stop()
  }
}
