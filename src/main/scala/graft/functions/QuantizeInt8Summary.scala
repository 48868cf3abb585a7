package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

/** One-pass int8-quantization audit summary of an `array<float>`
  * embedding: `struct(scale, n_dims, sum_code, min_code, max_code,
  * n_zero)` — the five interpreted higher-order-function chains of the
  * previous formulation (transform + aggregate + array_min/max +
  * filter over the codes array, each CodegenFallback and each
  * materializing a boxed codes array per row) fused into two unboxed
  * loops with zero allocation beyond the result row.
  *
  * Semantics are IDENTICAL to the HOF chain the DuckDB oracle mirrors
  * (`p_embedding_quantize`; property-tested in MinhashSignatureSpec):
  *
  *  - `scale = array_max(transform(v, x -> abs(double(x))))` — NULL
  *    elements skipped, NULL for empty/all-NULL arrays, NaN ranks
  *    largest (Spark double ordering);
  *  - `code_i`: `q = double(x_i) * 127.0 / scale`; `0` when
  *    `scale = 0.0` OR `!(|q| <= 127.0)` (the bounds guard catches
  *    NaN/±Inf on both engines), else `trunc(q)::int` (Java `(int)`
  *    truncates toward zero exactly like Spark's double→int cast and
  *    the oracle's `trunc()`); NULL when `x_i` is NULL (and scale is
  *    neither NULL nor 0.0) or when scale is NULL;
  *  - `n_dims  = bigint(size(codes))` (counts NULL elements);
  *  - `sum_code = aggregate(codes, 0L, acc + c)` — left fold, so ANY
  *    NULL code nulls the sum (SQL `NULL + x = NULL`);
  *  - `min_code/max_code = array_min/array_max(codes)` — NULLs
  *    skipped, NULL for empty/all-NULL;
  *  - `n_zero = bigint(size(filter(codes, c -> c = 0)))` — a NULL
  *    code fails the predicate and is not counted;
  *  - NULL array → NULL struct.
  */
case class QuantizeInt8Summary(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got $other")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = true),
    StructField("n_dims", LongType, nullable = false),
    StructField("sum_code", LongType, nullable = true),
    StructField("min_code", IntegerType, nullable = true),
    StructField("max_code", IntegerType, nullable = true),
    StructField("n_zero", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_quantize_int8_summary"

  def compute(v: ArrayData): InternalRow = {
    val n = v.numElements()

    // Pass 1: scale = max over non-NULL elements of |x| (double).
    // Spark's double ordering ranks NaN above everything, so a NaN
    // element pins the max at NaN; abs() maps -0.0 to +0.0 so the
    // zero-scale equality below needs no signed-zero care.
    var scale = 0.0
    var scaleNull = true
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getFloat(i).toDouble)
        if (scaleNull) { scale = a; scaleNull = false }
        else if (java.lang.Double.isNaN(a)) scale = a
        else if (!java.lang.Double.isNaN(scale) && a > scale) scale = a
      }
      i += 1
    }

    // Pass 2: fold the code stream directly into the five summaries
    // (the codes array itself is never materialized).
    val zeroScale = !scaleNull && scale == 0.0
    var sum = 0L
    var sumNull = false
    var minC = 0
    var maxC = 0
    var minMaxNull = true
    var nZero = 0L
    i = 0
    while (i < n) {
      val xNull = v.isNullAt(i)
      if (zeroScale) {
        // scale = 0.0 short-circuits the OR even for NULL elements
        nZero += 1L
        if (minMaxNull) { minC = 0; maxC = 0; minMaxNull = false }
        // code 0 → sum unchanged
      } else if (xNull || scaleNull) {
        sumNull = true // NULL code poisons the left fold permanently
      } else {
        val q = v.getFloat(i).toDouble * 127.0 / scale
        val code = if (!(math.abs(q) <= 127.0)) 0 else q.toInt
        if (!sumNull) sum += code
        if (minMaxNull) { minC = code; maxC = code; minMaxNull = false }
        else {
          if (code < minC) minC = code
          if (code > maxC) maxC = code
        }
        if (code == 0) nZero += 1L
      }
      i += 1
    }

    val out = new GenericInternalRow(6)
    if (scaleNull) out.setNullAt(0) else out.setDouble(0, scale)
    out.setLong(1, n.toLong)
    if (sumNull) out.setNullAt(2) else out.setLong(2, sum)
    if (minMaxNull) { out.setNullAt(3); out.setNullAt(4) }
    else { out.setInt(3, minC); out.setInt(4, maxC) }
    out.setLong(5, nZero)
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("q8sum", this, classOf[QuantizeInt8Summary].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Summary =
    copy(child = newChild)
}
