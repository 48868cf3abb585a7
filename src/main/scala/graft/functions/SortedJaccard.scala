package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.graftBridge

/** Exact Jaccard of two SORTED, duplicate-free `array<bigint>`
  * columns in ONE merge pass: |A∩B| / (|A| + |B| − |A∩B|).
  *
  * Why this exists when [[SortedIntersectCount]] already does: the
  * PPJoin verify writes `jac = inter/(la+lb−inter)` and filters on
  * `jac >= t`. Spark substitutes that projection into the filter and
  * pushes the filter into the verify JOIN's condition, and codegen
  * does not common-subexpression-eliminate across the condition and
  * the downstream projection — so the two-pointer merge ran up to
  * FOUR times per surviving pair (twice in the fused condition's
  * division, twice in the output projection; measured as the
  * dominant verify CPU at 100× ScaleStress). Returning the finished
  * ratio makes every evaluation site exactly one merge.
  *
  * The arithmetic is IDENTICAL to the two-step form — the division
  * `c / (na + nb − c)` over exact integer-valued doubles — so
  * results are bit-equal to the DuckDB oracle's. Arrays are
  * duplicate-free by the caller contract, hence |A∪B| = na+nb−c.
  * Both empty ⇒ defined as 0.0 (no shingles ⇒ no similarity; the
  * frontier filters empty arrays out before any verify anyway).
  *
  * PRECONDITION (caller contract, not checked at runtime): both
  * arrays sorted ascending with distinct non-null elements —
  * exactly what the hashed shingle frontier produces. On unsorted
  * input the count is an undercount, never an error.
  * Registered as SQL `graft_sorted_jaccard`.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sorted_jaccard"

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
    val union = na.toLong + nb.toLong - c
    if (union == 0L) 0.0 else c.toDouble / union.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val u = ctx.freshName("u")
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
        |final long $u = (long) $na + (long) $nb - $c;
        |${ev.value} = ($u == 0L) ? 0.0 : ((double) $c) / ((double) $u);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** Column-API form. */
  def apply(a: Column, b: Column): Column =
    graftBridge.column(
      SortedJaccard(graftBridge.expression(a), graftBridge.expression(b)))
}
