package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Curation decision log v2: the two round-12 gates compose with the
  * original three — each gate's verdict matches its standalone
  * operator, kept is the five-way conjunction, and an embedding-less
  * document passes the prototypicality gate. */
class CurationV2Spec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // long enough for quality; "a b"-heavy = target-ish grams
    (0L, "a b a b c d e f g h i j", "en"),
    (1L, "a b a b c d e f g h i j", "en"),   // exact dup of 0
    (2L, "x y x y z w q r s t u v", "de"),
    (3L, "short", "de")                       // quality drop (too_short);
    // also gram-free (1 token < bigram) -> affinity is the smoothed
    // prior 1.0 but sum_raw = 0, so affinity_keep must be FALSE
  ).toDF("doc_id", "text", "lang")

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.98f, 0.02f)),
    (2L, Array(0.3f, 0.7f))   // farthest from centroid 0's cluster...
    // doc 3 has NO embedding row — must pass the outlier gate
  ).toDF("vec_id", "embedding")

  test("gate verdicts match standalone operators; kept is the conjunction") {
    val cents = emb.filter(col("vec_id") === 0L)
    val out = Curation.reportV2(
      docs, "doc_id", "text", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding",
      isTarget = col("lang") === "en",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5,
      dsirDim = 64, dsirSalt = "dsir", minAffinity = 0.5,
      outlierFraction = 0.34)
      .collect().map(r => r.getLong(0) -> r).toMap

    // standalone verdicts
    val counts = Importance.targetAffinityCounts(
      docs, "doc_id", "text", col("lang") === "en", n = 2, dim = 64, salt = "dsir")
    val affRows = Importance.scoreAffinity(docs, "doc_id", "text", counts,
      n = 2, dim = 64, salt = "dsir")
      .select("doc_id", "affinity", "sum_raw").collect()
    val aff = affRows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sumRaw = affRows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val outliers = Similarity.embeddingOutliers(
      emb, "vec_id", "embedding", cents, "vec_id", "embedding", 0.34)
      .filter(col("outlier")).select("id").as[Long].collect().toSet

    docs.select("doc_id").as[Long].collect().foreach { id =>
      val r = out(id)
      assert(r.getAs[Double]("affinity") === aff(id), s"affinity drift doc $id")
      assert(r.getAs[Boolean]("affinity_keep") === (aff(id) >= 0.5 && sumRaw(id) > 0L))
      assert(r.getAs[Boolean]("embedding_outlier") === outliers(id),
        s"outlier drift doc $id")
      val conj = r.getAs[Boolean]("quality_keep") &&
        !r.getAs[Boolean]("exact_dup_loser") &&
        !r.getAs[Boolean]("near_dup_loser") &&
        r.getAs[Boolean]("affinity_keep") &&
        !r.getAs[Boolean]("embedding_outlier")
      assert(r.getAs[Boolean]("kept") === conj, s"kept != conjunction doc $id")
    }
    // the embedding-less doc passed the prototypicality gate
    assert(!out(3L).getAs[Boolean]("embedding_outlier"))
    // the gram-free doc scores the smoothed prior 1.0 but FAILS the
    // importance gate (sum_raw = 0 folded into affinity_keep)
    assert(out(3L).getAs[Double]("affinity") === 1.0)
    assert(!out(3L).getAs[Boolean]("affinity_keep"))
    // one cell of 3 members, fraction 0.34 -> ceil(1.02) = 2 flagged;
    // vec 2 (the farthest) is certainly among them
    assert(outliers.contains(2L))
  }

  test("reportV3: LM gate composes; unscorable docs pass; kept is the six-way conjunction") {
    val cents = emb.filter(col("vec_id") === 0L)
    // reference = the two en docs: their bigrams train the model, so
    // they score hit_frac 1.0; doc 2 shares NO bigram with them
    // (hit_frac 0.0); doc 3 has no bigram position (unscorable)
    val out = Curation.reportV3(
      docs, "doc_id", "text", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding",
      isTarget = col("lang") === "en",
      lmRef = col("lang") === "en",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5,
      dsirDim = 64, dsirSalt = "dsir", minAffinity = 0.5,
      outlierFraction = 0.34, minHitFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)
    assert(out(0L).getAs[Double]("lm_hit_frac") == 1.0 &&
      out(0L).getAs[Boolean]("lm_keep"))
    assert(out(2L).getAs[Double]("lm_hit_frac") == 0.0 &&
      !out(2L).getAs[Boolean]("lm_keep"))
    // the sub-bigram doc is unscorable: NULL hit_frac, gate passes
    assert(out(3L).isNullAt(out(3L).fieldIndex("lm_hit_frac")))
    assert(out(3L).getAs[Boolean]("lm_keep"))
    // kept = v2's five-way conjunction AND lm_keep
    out.values.foreach { r =>
      val conj = r.getAs[Boolean]("quality_keep") &&
        !r.getAs[Boolean]("exact_dup_loser") &&
        !r.getAs[Boolean]("near_dup_loser") &&
        r.getAs[Boolean]("affinity_keep") &&
        !r.getAs[Boolean]("embedding_outlier") &&
        r.getAs[Boolean]("lm_keep")
      assert(r.getAs[Boolean]("kept") === conj,
        s"kept != conjunction doc ${r.getLong(0)}")
    }
    // v2 verdict columns are untouched by the extension
    val v2 = Curation.reportV2(
      docs, "doc_id", "text", emb, "vec_id", "embedding",
      cents, "vec_id", "embedding",
      isTarget = col("lang") === "en",
      n = 3, k = 12, rowsPerBand = 3, threshold = 0.5,
      dsirDim = 64, dsirSalt = "dsir", minAffinity = 0.5,
      outlierFraction = 0.34)
      .collect().map(r => r.getLong(0) -> r).toMap
    out.foreach { case (id, r) =>
      Seq("quality_keep", "exact_dup_loser", "near_dup_loser",
        "affinity_keep", "embedding_outlier").foreach { c =>
        assert(r.getAs[Boolean](c) === v2(id).getAs[Boolean](c),
          s"$c drift doc $id")
      }
    }
  }

  test("lineage: every transition class, flipped gates, snapshot statuses") {
    val good = "the quick brown fox jumps over the lazy dog today and it is fine"
    // old run: 1 kept, 2 kept, 3 quality-dropped, 4 kept, 9 present
    val oldDocs = Seq(
      1L -> good,
      2L -> (good + " second variant"),
      3L -> "short",                       // too_short -> dropped
      4L -> (good + " fourth doc body"),
      9L -> (good + " soon to retire")
    ).toDF("doc_id", "text")
    // new run: 1 unchanged-kept; 2 becomes an exact dup of 1
    // (demoted, exact_dup_loser flips); 3's text grew past the
    // quality gate (promoted, quality_keep flips); 4 unchanged;
    // 9 removed; 5 added and kept; 6 added and quality-dropped
    val newDocs = Seq(
      1L -> good,
      2L -> good,
      3L -> (good + " now long enough to pass the gate"),
      4L -> (good + " fourth doc body"),
      5L -> (good + " fresh crawl arrival"),
      6L -> "tiny"
    ).toDF("doc_id", "text")
    def rep(d: org.apache.spark.sql.DataFrame) =
      Curation.report(d, "doc_id", "text",
        n = 3, k = 12, rowsPerBand = 3, threshold = 0.9)
    val out = Curation.lineage(
      oldDocs, newDocs, rep(oldDocs), rep(newDocs), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size === 7)
    def tr(id: Long) = out(id).getAs[String]("transition")
    def st(id: Long) = out(id).getAs[String]("status")
    def fl(id: Long) = out(id).getAs[String]("flipped_gates")
    assert(st(1L) === "unchanged" && tr(1L) === "still_kept" && fl(1L) === "")
    assert(st(2L) === "changed" && tr(2L) === "demoted")
    assert(fl(2L).split(",").contains("exact_dup_loser"))
    assert(st(3L) === "changed" && tr(3L) === "promoted")
    assert(fl(3L) === "quality_keep")
    assert(st(4L) === "unchanged" && tr(4L) === "still_kept")
    assert(st(9L) === "removed" && tr(9L) === "retired")
    assert(out(9L).isNullAt(out(9L).fieldIndex("new_kept")))
    assert(st(5L) === "added" && tr(5L) === "entered_kept" && fl(5L) === "")
    assert(out(5L).isNullAt(out(5L).fieldIndex("old_kept")))
    assert(st(6L) === "added" && tr(6L) === "entered_dropped")
    assert(out(6L).getAs[String]("new_drop_reason") === "too_short")
  }
}
