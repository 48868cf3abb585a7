package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused minhash signature: ONE pass over a shingle array computing,
  * for every seed j in 0 until k, the minimum of `md5('<j>:' || s)`
  * over the array's elements — bit-identical to the k-column
  * formulation
  * `(0 until k).map(j => array_min(transform(sh, s => md5(concat(lit(s"$j:"), s)))))`
  * the DuckDB oracle replays, but ~k× cheaper in allocation and
  * traversal:
  *
  *  - the k seeded digests of one element are computed in one visit
  *    (one UTF8 byte copy per element, not k array traversals each
  *    re-materializing the element);
  *  - minima are kept as 16 raw digest bytes and compared UNSIGNED
  *    byte-wise, which orders exactly like the lowercase-hex strings
  *    (hex encoding is a monotone byte-wise injection: per byte,
  *    0x00..0xff maps to "00".."ff" in ASCII order), so hex encoding
  *    happens k times per DOCUMENT, not k times per element;
  *  - no intermediate per-seed hex arrays (the transform allocated
  *    k arrays of 32-char strings per document).
  *
  * Semantics (matching the HOF formulation exactly):
  *  - NULL input array → NULL;
  *  - NULL elements are skipped (array_min ignores NULLs);
  *  - empty array / all-NULL elements → an array of k NULLs (each
  *    per-seed array_min of an empty set is NULL).
  *
  * Used by [[graft.operators.Dedup.minhashSignatureOver]]; the
  * signature schema (h0..h{k-1} string columns) is unchanged — the
  * operator projects this array through `element_at`.
  */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"k=$k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  // Per-task scratch (expressions are deserialized per task and each
  // task is single-threaded): one MessageDigest, the k seed prefixes'
  // UTF8 bytes, the current digest, and the k running minima.
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(j => s"$j:".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  @transient private lazy val cur = new Array[Byte](16)
  @transient private lazy val mins = new Array[Byte](k * 16)
  @transient private lazy val found = new Array[Boolean](k)

  private def lessUnsigned(a: Array[Byte], b: Array[Byte], bOff: Int): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(bOff + i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex16(src: Array[Byte], off: Int): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val b = src(off + i) & 0xff
      out(2 * i) = hexDigits(b >>> 4).toByte
      out(2 * i + 1) = hexDigits(b & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Core kernel, also the codegen entry point (one virtual call per
    * row keeps the surrounding projection in whole-stage codegen). */
  def compute(input: ArrayData): ArrayData = {
    java.util.Arrays.fill(found, false)
    val n = input.numElements()
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val bytes = input.getUTF8String(i).getBytes
        var j = 0
        while (j < k) {
          md.reset()
          md.update(prefixes(j))
          md.update(bytes)
          md.digest(cur, 0, 16)
          if (!found(j) || lessUnsigned(cur, mins, j * 16)) {
            System.arraycopy(cur, 0, mins, j * 16, 16)
            found(j) = true
          }
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      out(j) = if (found(j)) hex16(mins, j * 16) else null
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinhashSignature].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}
