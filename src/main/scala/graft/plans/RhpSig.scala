package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Packed random-hyperplane signature (Charikar 2002): bit p of the result
  * = sign(dot(plane_p, v)), all planes in one primitive pass per row.
  *
  * Replaces the HOF composition `transform(sequence, p => when(aggregate(
  * zip_with(...)) >= 0, 1, 0))` + per-band `xxhash64(concat_ws(slice))`
  * bucketing: that shape allocates a lambda frame and an array zip per
  * plane per row and then BUILDS STRINGS per band to derive bucket keys.
  * Here the signature is one long; band keys are bit slices
  * (`(sig >> band*r) & (2^r − 1)`). Two signatures share a band bucket iff
  * their r sign bits in that band are equal — exactly the relation the
  * hashed-string form grouped on — so candidate sets (and therefore ANN
  * results and golden pins) are unchanged.
  *
  * Dot products accumulate left-to-right like the `aggregate` fold, so the
  * sign bits are IEEE-identical to the HOF form. The plane matrix rides
  * the plan as a serialized reference (ctx.addReferenceObj), not as a
  * per-row expression.
  */
case class RhpSigPacked(child: Expression, planes: Array[Array[Double]]) extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 63, s"1..63 planes, got ${planes.length}")

  override def dataType: DataType = LongType

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"rhp_sig expects array<float|double>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    RhpSigPacked.compute(input.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("rhpPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.RhpSigPacked.compute($a, $planesRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhpSigPacked {

  /** One primitive pass: all plane dots, packed sign bits. Public static —
    * invoked from generated code.
    *
    * Null-element parity with the HOF reference form: there, a null
    * element nulls the zip_with product and thus EVERY plane's dot, and
    * `when(dot >= 0, 1).otherwise(0)` turns the null predicate into bit 0
    * for all planes — i.e. signature 0. Reproduced here by an explicit
    * null scan (ArrayData.getDouble would silently read a null slot as
    * 0.0 and diverge). */
  def compute(arr: ArrayData, planes: Array[Array[Double]], isFloat: Boolean): Long = {
    val m = arr.numElements()
    // length mismatch parity: zip_with null-pads the shorter side, nulling
    // the dot for every plane → signature 0 in the HOF form
    if (m != planes(0).length) return 0L
    var j = 0
    while (j < m) {
      if (arr.isNullAt(j)) return 0L
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var s = 0.0
      var i = 0
      while (i < m) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        s += x * w(i)
        i += 1
      }
      if (s >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  def rhpSigPacked(emb: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(RhpSigPacked(Bridge.expression(emb), planes))
}
