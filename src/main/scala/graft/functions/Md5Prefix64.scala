package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First 64 bits of `md5(s)` as a big-endian long — the simhash token
  * hash ([[graft.operators.Dedup.simhash64ByKey]]) without the hex
  * round-trip: the previous formulation materialized the 16-hex-char
  * `substring(md5(tok), 1, 16)` string per token row and re-parsed 16
  * nibbles out of it with `conv(substring(...))` columns; this kernel
  * hands the same 64 bits over as one long (bit i of the simhash
  * vote == bit i of this long: hex char c (1-based from the left) is
  * nibble (16−c) counted from the least-significant end, so the whole
  * prefix IS the big-endian first 8 digest bytes).
  *
  * NULL input → NULL; empty string hashes like md5 of empty bytes
  * (matching `md5('')`).
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_md5_prefix64"

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val cur = new Array[Byte](16)

  def compute(s: UTF8String): Long = {
    md.reset()
    md.update(s.getBytes)
    md.digest(cur, 0, 16)
    ((cur(0) & 0xffL) << 56) | ((cur(1) & 0xffL) << 48) |
      ((cur(2) & 0xffL) << 40) | ((cur(3) & 0xffL) << 32) |
      ((cur(4) & 0xffL) << 24) | ((cur(5) & 0xffL) << 16) |
      ((cur(6) & 0xffL) << 8) | (cur(7) & 0xffL)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Prefix", this, classOf[Md5Prefix64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix64 =
    copy(child = newChild)
}
