package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native expression — the fuzzy
  * string-match primitive entity reconciliation runs at scale (names,
  * addresses, product titles), complementing the exact edit-distance
  * verify: Levenshtein counts edits, Jaro–Winkler rewards shared
  * prefixes and tolerates transpositions, which is what human-entered
  * name variants look like.
  *
  * Standard public algorithm (Winkler 1990): match window
  * ⌊max(|a|,|b|)/2⌋−1, half-transposition counting, prefix boost
  * p=0.1 over the first ≤4 common chars applied when jaro > 0.7.
  * Arithmetic is the canonical dag — (m/|a| + m/|b| + (m−t)/m)/3,
  * then jw = j + ℓ·0.1·(1−j) — which is bit-identical to DuckDB's
  * `jaro_winkler_similarity` on the driver oracle (validated by the
  * hash-matched query, not assumed). Codepoint-based (not UTF-16
  * units), so supplementary characters count once, like the oracle.
  *
  * Scale: a per-row scalar (O(|a|·|b|) worst case) intended for the
  * VERIFY stage over bounded candidate pairs — the same contract as
  * [[graft.operators.Dedup.editDistanceVerify]]; candidate generation
  * stays with the LSH/blocking operators.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Reference implementation (codepoints; Winkler p=0.1, boost
    * threshold 0.7, prefix ≤ 4). Edge convention follows the driver
    * oracle (DuckDB `jaro_winkler_similarity`): ANY empty operand —
    * including both empty — scores 0.0 (jellyfish-style libraries
    * return 1.0 for two empties; portability wins here and the case
    * is degenerate either way). */
  def similarity(sa: String, sb: String): Double = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    if (a.length == 0 || b.length == 0) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val aMatch = new Array[Boolean](a.length)
    val bMatch = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order; t = half the
    // out-of-order count
    var trans = 0
    var j = 0
    i = 0
    while (i < a.length) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a(i) != b(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val t = trans / 2 // integer half-transpositions (standard)
    val md = m.toDouble
    val jaro = (md / a.length + md / b.length + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    while (l < math.min(4, math.min(a.length, b.length)) && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
