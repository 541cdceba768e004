package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Top-`nProbe` IVF centroid ids for an embedding: the ids of the `nProbe`
  * centroids with the largest dot product against the vector, descending
  * (ties → lower id). With L2-NORMALIZED centroids the dot ordering equals
  * the cosine ordering for a fixed vector (|v| scales every dot equally),
  * so nProbe=1 is the cosine nearest-centroid assignment and nProbe=P the
  * query-side probe list — the coarse-quantizer primitive of an IVF index
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011, minus the PQ residual codes).
  *
  * One primitive pass per row (L×D multiply-adds + an O(L·P) partial
  * selection), same native-expression shape as [[RhpSigPacked]]: the
  * centroid matrix rides the plan as a serialized reference, and codegen
  * calls a public static helper so rows stay inside WholeStageCodegen.
  *
  * Malformed vectors (null element, length ≠ centroid dim) probe NOTHING
  * (empty array): they drop out of both the index and the query side of an
  * ANN join rather than silently landing in a wrong list.
  */
case class IvfProbes(child: Expression, centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {
  require(centroids.nonEmpty, "ivf_probes: need at least one centroid")
  require(nProbe >= 1 && nProbe <= centroids.length,
    s"ivf_probes: nProbe must be in 1..${centroids.length}, got $nProbe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ivf_probes expects array<float|double>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    IvfProbes.compute(input.asInstanceOf[ArrayData], centroids, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.IvfProbes.compute($a, $centsRef, $nProbe, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfProbes {

  /** All centroid dots + top-p partial selection. Public static — invoked
    * from generated code. Deterministic: ties break toward the lower
    * centroid id (strict `>` while scanning ids in ascending order). */
  def compute(arr: ArrayData, cents: Array[Array[Double]], p: Int, isFloat: Boolean): ArrayData = {
    val m = arr.numElements()
    if (m != cents(0).length) return new GenericArrayData(Array.empty[Int])
    var j = 0
    while (j < m) {
      if (arr.isNullAt(j)) return new GenericArrayData(Array.empty[Int])
      j += 1
    }
    val l = cents.length
    val dots = new Array[Double](l)
    var c = 0
    while (c < l) {
      val w = cents(c)
      var s = 0.0
      var i = 0
      while (i < m) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        s += x * w(i)
        i += 1
      }
      dots(c) = s
      c += 1
    }
    // O(L·P) selection: P is small (≤ ~16); avoids a full sort per row
    val out = new Array[Int](p)
    val taken = new Array[Boolean](l)
    var k = 0
    while (k < p) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < l) {
        if (!taken(i) && dots(i) > bestDot) { best = i; bestDot = dots(i) }
        i += 1
      }
      // a NaN element makes EVERY dot NaN and no candidate compares above
      // -Inf — treat like the other malformed shapes: probe nothing
      if (best < 0) return new GenericArrayData(Array.empty[Int])
      taken(best) = true
      out(k) = best
      k += 1
    }
    new GenericArrayData(out)
  }

  def ivfProbes(emb: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    Bridge.column(IvfProbes(Bridge.expression(emb), centroids, nProbe))
}
