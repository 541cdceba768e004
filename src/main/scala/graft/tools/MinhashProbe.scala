package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object MinhashProbe {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROBE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()
    docs.count()
    val sh = docs.select(col("doc_id").as("id"), Dedup.wordShingles(col("text"), 3).as("sh"))
    t("shingles")(sh.count())
    val sig = sh.withColumn("sig", Dedup.minhashSignature(col("sh"), 32))
    t("signatures")(sig.count())
    t("signatures2")(sig.count())
    val banded = sig.select(col("id"), explode(Dedup.lshBandKeys(col("sig"), 32, 16)).as("bk"))
    t("banded")(banded.count())
    val sigC = sig.cache(); sigC.count()
    val bandedC = sigC.select(col("id"), explode(Dedup.lshBandKeys(col("sig"), 32, 16)).as("bk"))
    t("banded-cached-sig")(bandedC.count())
    // band keys WITHOUT concat/cast: hash the two longs directly
    val banded2 = sigC.select(col("id"), explode(transform(sequence(lit(0), lit(15)),
      b => struct(b.as("band"), xxhash64(element_at(col("sig"), b * 2 + 1), element_at(col("sig"), b * 2 + 2)).as("bucket")))).as("bk"))
    t("banded-direct-hash")(banded2.count())
    t("full")(Dedup.minhashLshPairs(docs, col("doc_id"), col("text")).count())
    spark.stop()
  }
}
