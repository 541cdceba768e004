package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Cosine similarity over INTEGER-QUANTIZED embeddings — the
  * cross-engine-DETERMINISTIC sibling of [[CosineSim]].
  *
  * [[CosineSim]] accumulates dot/norms in floating point, so its value (and
  * therefore a top-k rank boundary) depends on the summation's rounding; an
  * independent engine recomputing "the same" cosine lands an ulp away and
  * may flip the rank-k/rank-k+1 order — unverifiable by an external oracle.
  * Here the inputs are integral (each element `round(x·2^20)`, exact in
  * double), the dot and both norms accumulate in EXACT int64 arithmetic
  * (order-insensitive), and the only FP ops are a fixed final sequence over
  * those exact integers:
  *
  *   sim = (double)dot / sqrt((double)na · (double)nb)
  *
  * — each step IEEE-correctly-rounded on identical inputs, hence
  * bit-identical in ANY engine that spells the same sequence (the DuckDB
  * mirror: `CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS
  * DOUBLE))`). This is what lets q_ann_ivf_recall's ranking be
  * driver-checked instead of golden-pinned. Bounds: 64-dim, |x| ≤ 1 at
  * scale 2^20 → |element| ≤ 2^20, Σx² ≤ 64·2^40 = 2^46 — int64 exact with
  * headroom.
  *
  * Inputs are `array<double>` carrying integral values (the output of
  * `transform(emb, x -> round(x * S))`) or `array<long>`; elements are
  * truncated `(long)` (exact for integral doubles). NULL input → NULL;
  * length mismatch or a zero norm → 0.0 (mirrors CosineSim's contract; a
  * quantized real embedding cannot have zero norm unless the original was
  * ~0 everywhere).
  */
case class QuantCosine(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _) | ArrayType(LongType, _),
          ArrayType(DoubleType, _) | ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"quant_cosine expects two array<double>/array<long> args, got ${left.dataType} and ${right.dataType}")
  }

  private def elemIsLong(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return 0.0
    val al = elemIsLong(left); val bl = elemIsLong(right)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = if (al) a.getLong(i) else a.getDouble(i).toLong
      val y = if (bl) b.getLong(i) else b.getDouble(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na > 0L && nb > 0L) dot.toDouble / math.sqrt(na.toDouble * nb.toDouble) else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(arr: String, idx: String, isLong: Boolean): String =
      if (isLong) s"$arr.getLong($idx)" else s"(long) $arr.getDouble($idx)"
    val al = elemIsLong(left); val bl = elemIsLong(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |if ($n == $b.numElements()) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $x = ${get(a, i, al)};
         |    final long $y = ${get(b, i, bl)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |}
         |${ev.value} = ($na > 0L && $nb > 0L)
         |  ? (double) $dot / java.lang.Math.sqrt((double) $na * (double) $nb) : 0.0;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantCosine {
  /** Column-API surface. */
  def quantCosine(a: Column, b: Column): Column =
    Bridge.column(QuantCosine(Bridge.expression(a), Bridge.expression(b)))

  /** THE quantization scale (2^20): |x| ≤ 1 floats quantize to ≤ 2^20,
    * keeping 64-dim dot/norm sums ≤ 2^46 in int64, and k·2^20 + 0.5 tie
    * points are float-representable with both engines rounding
    * half-away-from-zero identically. */
  val Scale: Double = 1048576.0

  /** The single definition of the integer-quantized embedding projection
    * (integral doubles; consumed by [[quantCosine]]) — the DuckDB mirror
    * is `list_transform(emb, x -> CAST(round(x * 1048576.0) AS BIGINT))`.
    * One definition on each side: a scale or rounding change must happen
    * here and in the oracles' shared CTE, nowhere else. */
  def quantizeEmb(emb: Column): Column = {
    import org.apache.spark.sql.functions.{lit, round, transform}
    transform(emb, x => round(x.cast("double") * lit(Scale)))
  }
}
