package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token stats,
  * quality scoring, language identification, fingerprinting. All pure
  * built-in expressions (codegen'd, no UDFs), so they vectorize and
  * are portable to the SQL oracle.
  */
object TextAnalysis {

  /** Stopword list used by the quality / language heuristics. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Count of tokens that are stopwords. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(Stopwords))).cast("long")

  /** Ratio of stopword tokens to all tokens (0 when empty). */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0L, lit(0.0d)).otherwise(stopwordCount(text).cast("double") / n)
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    val chars = length(text) - (n - 1) // single-space-joined corpora
    when(n === 0L, lit(0.0d)).otherwise(chars.cast("double") / n)
  }

  /** Punctuation character count (ASCII punctuation classes). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", ""))).cast("long")

  /** Heuristic document quality in [0,1]: rewards natural stopword
    * density, a plausible mean word length, and non-trivial length.
    * Deterministic double arithmetic (oracle-reproducible). */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(tokenCount(text).cast("double") / 100.0d, lit(1.0d))
    val stopScore = least(stopwordRatio(text) * 5.0d, lit(1.0d))
    val wordScore = when(avgTokenLen(text).between(3.0d, 10.0d), 1.0d).otherwise(0.5d)
    lenScore * 0.4d + stopScore * 0.3d + wordScore * 0.3d
  }

  /** N-gram-free language-ID heuristic: votes from tiny per-language
    * marker lexica over the token array; ties and no-evidence fall
    * back to 'und'. Deterministic and oracle-expressible. */
  def langGuess(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "is", "with"),
      "es" -> Seq("el", "la", "los", "las", "es"),
      "fr" -> Seq("le", "la", "les", "est", "et"),
      "de" -> Seq("der", "die", "das", "und", "ist"),
      "zh" -> Seq("的", "是", "了", "和", "在"))
    val toks = tokens(text)
    val votes = markers.map { case (lang, ws) =>
      lang -> size(filter(toks, t => t.isInCollection(ws)))
    }
    val best = votes.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declaration order) achieving the max vote > 0
    votes.reverse.foldLeft(lit("und")) { case (acc, (lang, v)) =>
      when(v === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Stable 128-bit content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = Dedup.fingerprint(text)
}
