package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftBridge

/** Intersection COUNT of two SORTED, duplicate-free `array<bigint>`
  * columns — the set-similarity verify kernel.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side and a
  * result array per row; in a dedup verify join that is two heap
  * allocations and a hash probe per element for hundreds of
  * thousands of candidate pairs, only for the array to be discarded
  * after `size`. This expression is the classic merge-step two-pointer
  * count: one fused loop, zero allocation, whole-stage codegen.
  *
  * PRECONDITION (caller contract, not checked at runtime): both
  * arrays sorted ascending with distinct non-null elements —
  * exactly what `array_sort(transform(array_distinct(...), xxhash64))`
  * produces in [[graft.operators.Dedup]]'s hashed shingle frontier.
  * On unsorted input the count is an undercount, never an error.
  * Registered as SQL `graft_intersect_count`.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        |final int $na = $a.numElements();
        |final int $nb = $b.numElements();
        |int $i = 0, $j = 0; long $c = 0L;
        |while ($i < $na && $j < $nb) {
        |  final long $xv = $a.getLong($i);
        |  final long $yv = $b.getLong($j);
        |  if ($xv < $yv) $i++;
        |  else if ($xv > $yv) $j++;
        |  else { $c++; $i++; $j++; }
        |}
        |${ev.value} = $c;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API form. */
  def apply(a: Column, b: Column): Column =
    graftBridge.column(
      SortedIntersectCount(graftBridge.expression(a), graftBridge.expression(b)))
}
