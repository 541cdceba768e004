package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable point buffer: parallel arrays with amortized-doubling append.
  * Only the first `n` slots are live (the encoder serializes spare capacity
  * too, but that only happens at partial-aggregate boundaries). */
final case class GBuf(ts: Array[Long], vs: Array[Double], n: Int)

/** One decoded point (named fields for a readable exploded schema). */
final case class GPoint(ts_us: Long, v: Double)

/** Typed aggregator producing a Gorilla-compressed BinaryType block per
  * group — the tier-value storage format required by the north rule.
  *
  * merge() is a plain array concat; finish() canonically sorts by
  * (ts, rawBits) before encoding, so the output block is a deterministic
  * function of the point MULTISET — independent of partition order and of
  * salting. That is what makes salted partial blocks merge associatively
  * (SURVEY.md §7 M5/M6).
  *
  * Registered via functions.udaf → runs as a TypedImperativeAggregate:
  * the buffer lives as a JVM object inside ObjectHashAggregate and is
  * serialized only at partial-output boundaries.
  *
  * Inputs are BOXED and null/NaN rows are skipped inside reduce() (na.rm
  * parity — nulls are not representable in a block), so the aggregate can
  * sit in the SAME groupBy().agg(...) as the stat-block aggregates without
  * a row filter — one scan, one shuffle, no stat/gorilla join (TierStore).
  */
class GorillaAggregator extends Aggregator[(java.lang.Long, java.lang.Double), GBuf, Array[Byte]] {

  override def zero: GBuf = GBuf(new Array[Long](8), new Array[Double](8), 0)

  override def reduce(b: GBuf, a: (java.lang.Long, java.lang.Double)): GBuf = {
    if (a._1 == null || a._2 == null || a._2.doubleValue().isNaN) return b
    val g = if (b.n < b.ts.length) b
    else GBuf(java.util.Arrays.copyOf(b.ts, b.n * 2), java.util.Arrays.copyOf(b.vs, b.n * 2), b.n)
    g.ts(g.n) = a._1.longValue()
    g.vs(g.n) = a._2.doubleValue()
    g.copy(n = g.n + 1)
  }

  override def merge(x: GBuf, y: GBuf): GBuf = {
    val ts = new Array[Long](x.n + y.n)
    val vs = new Array[Double](x.n + y.n)
    System.arraycopy(x.ts, 0, ts, 0, x.n)
    System.arraycopy(y.ts, 0, ts, x.n, y.n)
    System.arraycopy(x.vs, 0, vs, 0, x.n)
    System.arraycopy(y.vs, 0, vs, x.n, y.n)
    GBuf(ts, vs, ts.length)
  }

  override def finish(b: GBuf): Array[Byte] = {
    val idx = (0 until b.n).sortBy(i => (b.ts(i), java.lang.Double.doubleToRawLongBits(b.vs(i))))
    val ts = new Array[Long](b.n)
    val vs = new Array[Double](b.n)
    var k = 0
    idx.foreach { i => ts(k) = b.ts(i); vs(k) = b.vs(i); k += 1 }
    Gorilla.encode(ts, vs, b.n)
  }

  override def bufferEncoder: Encoder[GBuf] = Encoders.product[GBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object GorillaAgg {

  /** Column-level aggregate: gorilla block of (unix_micros(ts), value).
    * Null/NaN input rows are skipped (boxed encoders), so no pre-filter is
    * needed and the aggregate fuses with stat-block aggregates. */
  def gorillaBlock(tsUs: Column, value: Column): Column = {
    val agg = udaf(new GorillaAggregator, Encoders.tuple(Encoders.LONG, Encoders.DOUBLE))
    agg(tsUs, value)
  }

  /** Build a Gorilla-compressed tier: one block per (entity, bucket), plus
    * point count and block size (bytes/point is the BASELINE.md compression
    * metric). Null measures are skipped (na.rm parity — nulls are not
    * representable in the block; see Gorilla scaladoc). */
  def compressedTier(
      raw: DataFrame,
      entity: Column,
      ts: Column,
      value: Column,
      interval: String): DataFrame = {
    raw
      .where(value.isNotNull && !isnan(value))
      .groupBy(entity.as("conv_id"), window(ts, interval).as("w"))
      .agg(gorillaBlock(unix_micros(ts.cast("timestamp")), value.cast("double")).as("block"))
      .withColumn("bucket_start", col("w.start"))
      .drop("w")
      .withColumn("n_points", udf((b: Array[Byte]) => Gorilla.pointCount(b)).apply(col("block")))
      .withColumn("block_bytes", length(col("block")))
  }

  /** Decode a block column to array<struct<ts_us,v>> (explode to re-expand).
    * Scala UDF at the decode edge only — encode/merge stay in the
    * aggregate; hot rollup paths never decode. */
  def decodeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => Gorilla.decodeSeq(b).map { case (t, v) => GPoint(t, v) })
}
