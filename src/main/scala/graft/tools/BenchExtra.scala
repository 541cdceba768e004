package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev benchmark: time a SUBSET of catalog queries with EXACTLY the
  * Bench.scala per-query methodology (fresh session per batch of 10, one
  * untimed warm-up action, noop sink, min of 2 interleaved passes x
  * min-of-2 each) — for before/after comparisons while optimizing without
  * paying for the full bench. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... runMain graft.tools.BenchExtra [query...]
  * (no names → all queries). Prints one JSON line like Bench's `queries`. */
object BenchExtra {

  // Mirrors Bench.session verbatim — Bench.scala is a FROZEN driver
  // surface (hashed by the driver), so its private session builder cannot
  // be widened for sharing; keep this copy in sync by hand.
  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names =
      if (args.nonEmpty) args.toSeq.sorted
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    val batchSize = 10
    def runPass(): Map[String, Double] = qs.grouped(batchSize).flatMap { batch =>
      val s = session(cpus)
      try s.read.parquet(s"$sfDir/events.parquet").write.mode("overwrite").format("noop").save()
      catch { case scala.util.control.NonFatal(_) => () }
      val timed = batch.map { case (name, fn) =>
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(s, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }
        val sec =
          try math.min(once(), once())
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[benchextra] query $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
              -1.0
          }
        name -> sec
      }
      s.stop()
      timed
    }.toMap
    val passes = Seq(runPass(), runPass())
    val results = names.map { n =>
      val ok = passes.map(_(n)).filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    println(results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{\"benchextra\":{", ",", "}}"))
  }
}
