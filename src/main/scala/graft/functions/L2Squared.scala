package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd SQUARED L2 distance over two `array<float>`
  * columns — the distance kernel of the PQ pipeline (encoding scores
  * corpus·m·ks sub-vector pairs; LUT building scores |Q|·m·ks), where
  * the higher-order `aggregate(zip_with(...))` formulation runs
  * interpreted with a per-row zipped-array allocation (measured at
  * the 50× ScaleStress: a 17.8 s encoding task that this expression
  * collapses into whole-stage codegen).
  *
  * Semantics are IDENTICAL to the HOF formulation the DuckDB oracle
  * mirrors (property-tested against it in FunctionsSpec):
  *
  *  - each difference is computed in double (float→double exact) and
  *    the squares accumulate LEFT-TO-RIGHT, bit-identical to
  *    `list_sum(list_transform(list_zip(...), (x−y)·(x−y)))`;
  *  - NULL if either array is NULL, the lengths differ, or any
  *    element is NULL (zip_with pads ⇒ NULL product ⇒ NULL sum);
  *  - empty arrays ⇒ 0.0 (the fold's zero).
  *
  * Registered as SQL function `graft_l2sq` via [[GraftFunctions]].
  */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch / NULL element
  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    final double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
        |    $acc += $d * $d;
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $acc;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}
