package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused canonical-text fingerprint:
  * `md5(lower(regexp_replace(text, "\\s+", " ")))` in one pass —
  * bit-identical to the three-expression chain the DuckDB oracle
  * replays ([[graft.operators.Dedup.fingerprint]]), without the
  * regex engine, the intermediate collapsed string, or the separate
  * lowercase string:
  *
  *  - Java regex `\s` is exactly the six ASCII bytes
  *    { ' ', \t, \n, \x0B, \f, \r } (no UNICODE_CHARACTER_CLASS), all
  *    single-byte in UTF-8 and never part of a multi-byte sequence,
  *    so a byte-level scan replacing each maximal run with one 0x20
  *    reproduces `regexp_replace(text, "\\s+", " ")` byte-for-byte;
  *  - `lower` under the default UTF8_BINARY collation is
  *    `isFullAscii ? toLowerCaseAscii : slow-path`
  *    (CollationAwareUTF8String.toLowerCase with
  *    spark.sql.icu.caseMappings.enabled, UTF8String.toLowerCase
  *    without). The kernel lowers A–Z inline on the (overwhelmingly
  *    common) all-ASCII path and delegates non-ASCII strings to the
  *    SAME CollationSupport.Lower.exec entry point the Lower
  *    expression calls, with the same conf-derived useICU flag — so
  *    both paths are the engine's own semantics, not a
  *    reimplementation;
  *  - md5 digest bytes hex-encode once at the end (lowercase, like
  *    DigestUtils.md5Hex).
  *
  * NULL text → NULL. The r21 task-thread sampling showed the
  * three-expression chain (regex + collation lower + hex) as a top
  * per-row cost of the exact-dedup hash aggregations; at 100 TB this
  * expression runs once per document per exact-dedup/diff frontier.
  */
case class FingerprintMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_fingerprint_md5"

  // Same flag the Lower expression derives (lazy, conf-captured).
  @transient private lazy val useICU: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.getConf(
      org.apache.spark.sql.internal.SQLConf.ICU_CASE_MAPPINGS_ENABLED)

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val digest = new Array[Byte](16)
  @transient private var buf: Array[Byte] = _

  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(s: UTF8String): UTF8String = {
    val in = s.getBytes
    if (buf == null || buf.length < in.length) buf = new Array[Byte](math.max(in.length, 64))
    var n = 0
    var allAscii = true
    var i = 0
    val len = in.length
    while (i < len) {
      val b = in(i)
      if (isWs(b)) {
        buf(n) = 0x20; n += 1
        i += 1
        while (i < len && isWs(in(i))) i += 1
      } else {
        if (b < 0) allAscii = false
        buf(n) = b; n += 1
        i += 1
      }
    }
    md.reset()
    if (allAscii) {
      var j = 0
      while (j < n) {
        val b = buf(j)
        if (b >= 'A' && b <= 'Z') buf(j) = (b + 32).toByte
        j += 1
      }
      md.update(buf, 0, n)
    } else {
      val lowered = org.apache.spark.sql.catalyst.util.CollationSupport.Lower.exec(
        UTF8String.fromBytes(java.util.Arrays.copyOf(buf, n)),
        org.apache.spark.sql.catalyst.util.CollationFactory.UTF8_BINARY_COLLATION_ID,
        useICU)
      md.update(lowered.getBytes)
    }
    md.digest(digest, 0, 16)
    val out = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      val b = digest(j) & 0xff
      out(2 * j) = hexDigits(b >>> 4).toByte
      out(2 * j + 1) = hexDigits(b & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fpMd5", this, classOf[FingerprintMd5].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): FingerprintMd5 =
    copy(child = newChild)
}
