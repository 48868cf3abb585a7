package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document stupid-backoff scoring against a FROZEN model — the
  * streaming LM gate's kernel ([[graft.operators.LanguageModel
  * .perplexityColumn]] / `StreamingOps.perplexityFilterStream`).
  *
  * The model (unigram counts, bigram counts, totals) is NOT a child
  * expression: it is held as constructor state in real hash maps and
  * ships with the serialized plan, exactly like a PQ codebook or a
  * Bloom blob. This exists because the declarative alternative — a
  * fold with `element_at` probes of map LITERALS — scans Spark's
  * ArrayBasedMapData LINEARLY per probe: O(|doc|·|model|) string
  * compares per document (measured: a ~900-bigram toy model pushed a
  * 5k-doc micro-batch to ~40 s on one core; a real curated model has
  * 10⁵–10⁶ bigrams and the fold never finishes). Here each position
  * is two O(1) hash probes; keys are pre-bridged to [[UTF8String]]
  * once per executor so probing allocates nothing.
  *
  * Input: the document's token array (`array<string>`, split on
  * space upstream). Output, matching the batch operator's columns:
  * struct(n_scored, n_hit, n_backoff LONG, hit_frac, avg_logprob,
  * ppl DOUBLE — NULL when no bigram position). Arithmetic is
  * per-position identical to [[graft.operators.LanguageModel
  * .perplexity]]'s join form:
  *   hit:     lp = ln(c2 / c1(ctx))
  *   backoff: lp = ln(alpha) + ln((c1(w) + 1) / (N + V))
  * Integer tallies and hit_frac are bit-identical to the batch
  * operator; the logprob sum runs in DOCUMENT order where the batch
  * aggregation sums in shuffle order, so ln/exp surfaces agree up to
  * FP reassociation (the library's standing oracle split). */
case class BackoffLmScore(
    child: Expression,
    uniCounts: Map[String, Long], biCounts: Map[String, Long],
    nTotal: Long, vocab: Long, alpha: Double)
  extends UnaryExpression with CodegenFallback {

  require(alpha > 0, s"alpha=$alpha must be > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_scored", LongType, nullable = false),
    StructField("n_hit", LongType, nullable = false),
    StructField("n_backoff", LongType, nullable = false),
    StructField("hit_frac", DoubleType, nullable = true),
    StructField("avg_logprob", DoubleType, nullable = true),
    StructField("ppl", DoubleType, nullable = true)))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_backoff_lm"

  // executor-side O(1) probe tables, built once per deserialized
  // expression; UTF8String keys so array elements probe directly.
  // Values are BOXED java.lang.Long — with a primitive value type,
  // Java's null-on-miss would silently unbox to 0L and every probe
  // would "hit"
  @transient private lazy val uniMap: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](uniCounts.size * 2)
    uniCounts.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  @transient private lazy val biMap: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](biCounts.size * 2)
    biCounts.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  @transient private lazy val logAlpha = StrictMath.log(alpha)
  @transient private lazy val denom = (nTotal + vocab).toDouble
  @transient private lazy val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(toksAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var scored = 0L
    var hits = 0L
    var lpSum = 0.0
    var i = 0
    while (i < n - 1) {
      val w1 = toks.getUTF8String(i)
      val w2 = toks.getUTF8String(i + 1)
      if (w1 != null && w2 != null) {
        scored += 1
        val gram = UTF8String.concat(w1, space, w2)
        val c2 = biMap.get(gram)
        val c1 = uniMap.get(w1)
        if (c2 != null && c1 != null) {
          hits += 1
          lpSum += StrictMath.log(c2.toDouble / c1.toDouble)
        } else {
          val uw = uniMap.get(w2)
          val u = if (uw == null) 0L else uw.longValue()
          // ln(alpha) + ln((u+1)/(N+V)) — the SAME two StrictMath.log
          // calls (Spark's `log` expression is StrictMath.log) and
          // one division as the batch expression, so per-position
          // logprobs are bit-identical (only the summation order
          // differs across the two forms)
          lpSum += logAlpha + StrictMath.log((u + 1).toDouble / denom)
        }
      }
      i += 1
    }
    val row = new Array[Any](6)
    row(0) = scored
    row(1) = hits
    row(2) = scored - hits
    if (scored > 0) {
      row(3) = hits.toDouble / scored
      row(4) = lpSum / scored
      row(5) = StrictMath.exp(-(lpSum / scored))
    }
    InternalRow.fromSeq(row.toIndexedSeq)
  }

  override protected def withNewChildInternal(newChild: Expression): BackoffLmScore =
    copy(child = newChild)
}

object BackoffLmScore {
  /** Column-API form. */
  def score(
      toks: org.apache.spark.sql.Column,
      uniCounts: Map[String, Long], biCounts: Map[String, Long],
      nTotal: Long, vocab: Long, alpha: Double): org.apache.spark.sql.Column =
    graftBridge.column(BackoffLmScore(
      graftBridge.expression(toks), uniCounts, biCounts, nTotal, vocab, alpha))
}
