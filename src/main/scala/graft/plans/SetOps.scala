package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED-ascending distinct
  * array<bigint> columns, as a single merge walk — no hash set, no
  * allocation, whole-stage codegen.
  *
  * Why an Expression instead of size(array_intersect(a, b)): the built-in
  * builds an OpenHashSet per CALL, which dominates set-similarity verify
  * joins (hundreds of thousands of candidate pairs × array construction).
  * The merge walk is O(|A|+|B|) long-compares on the raw ArrayData buffers.
  * With distinct inputs, |A ∪ B| = |A|+|B|−|A∩B|, so one intersect count
  * also yields Jaccard (Dedup.prefixJaccardPairs verify path; the generic
  * Dedup.jaccard composition stays as the reference implementation).
  *
  * PRECONDITIONS (caller's contract, not checked): both arrays sorted
  * ascending, no duplicates, no null elements. `sort_array(array_distinct(
  * …))` establishes them.
  */
case class SortedIntersectSize(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_size expects two array<bigint> args, got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $c++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SetOps {
  /** Column-API surface. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expression(a), Bridge.expression(b)))

  /** Jaccard of two sorted distinct array<bigint> sets via one merge walk:
    * |A∩B| / (|A|+|B|−|A∩B|). Empty-vs-empty yields 0.0 (matches
    * Dedup.jaccard). */
  def sortedJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val inter = sortedIntersectSize(a, b).cast("double")
    val uni = size(a) + size(b) - inter
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }
}
