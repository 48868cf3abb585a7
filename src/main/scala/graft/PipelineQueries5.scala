package graft

import org.apache.spark.sql.functions._

/** Round-20 pipeline queries: G.711 µ-law/A-law decode (exact table
  * expansion — fully oracle-checkable like IMA-ADPCM), arbitrary-
  * offset audio trim tolerance (sliding probe-side segment hashes
  * against a single-phase catalog), animated-GIF-as-video (palette
  * arithmetic is exact, so composited frame stats get a full
  * oracle), shot-keyed video frame sampling, and the incremental +
  * lineage forms of the media curation report. Oracle discipline as
  * everywhere: DuckDB recomputes every sample/pixel from the fixture
  * formula, every hash bit, and every recursive closure — the Spark
  * side decodes real containers. */
object PipelineQueries5 {

  // --------------------------- G.711 µ-law / A-law decode
  // One byte per sample through the public CCITT expansions — pure
  // integer table math, so (unlike JPEG) the legacy-telephony decode
  // path is fully oracle-checkable. Clips 0/1 sweep ALL 256 codes of
  // each law (byte = frame index), clip 2 interleaves a stereo
  // pattern whose per-channel byte stream covers the full code space
  // (gcd(7, 256) = 1); junk emits nothing. The oracle replays
  // complement/XOR-0x55, mantissa·2^segment re-bias, and the sign
  // conventions (µ-law: bit set ⇒ negative; A-law: bit set ⇒
  // positive) per byte, then rebuilds the exact
  // [channels, rate, n_frames, mean…, rms…] stats vector.
  private val qG711Stats = Queries.Q(
    "p_g711_stats",
    Some("""
      WITH clips(id, ch, nf, law) AS (
        SELECT * FROM (VALUES (0, 1, 256, 'u'), (1, 1, 256, 'a'), (2, 2, 300, 'u'))),
      smp AS (
        SELECT id, ch, nf, c, f,
               CASE WHEN id = 2 THEN (f * 7 + c * 13) % 256 ELSE f % 256 END AS byte
        FROM clips,
             generate_series(0, 1) cs(c),
             generate_series(0, 299) fs(f)
        WHERE c < ch AND f < nf),
      lin AS (
        SELECT id, ch, nf, c, f,
               CASE WHEN law = 'u' THEN
                 CASE WHEN (255 - byte) >= 128
                      THEN 132 - ((((255 - byte) % 16) * 8 + 132)
                                  * (1 << (((255 - byte) // 16) % 8)))
                      ELSE ((((255 - byte) % 16) * 8 + 132)
                            * (1 << (((255 - byte) // 16) % 8))) - 132 END
               ELSE
                 CASE WHEN xor(byte, 85) >= 128 THEN 1 ELSE -1 END *
                 CASE WHEN (xor(byte, 85) // 16) % 8 = 0
                        THEN (xor(byte, 85) % 16) * 16 + 8
                      WHEN (xor(byte, 85) // 16) % 8 = 1
                        THEN (xor(byte, 85) % 16) * 16 + 264
                      ELSE ((xor(byte, 85) % 16) * 16 + 264)
                           * (1 << ((xor(byte, 85) // 16) % 8 - 1)) END
               END AS val
        FROM smp JOIN clips USING (id, ch, nf)),
      agg AS (
        SELECT id, ch, nf, c,
               SUM(CAST(val AS BIGINT)) AS s,
               SUM(CAST(val AS BIGINT) * val) AS sq
        FROM lin GROUP BY id, ch, nf, c),
      outp AS (
        SELECT id, 0 AS pos, CAST(ch AS DOUBLE) AS stat FROM clips
        UNION ALL SELECT id, 1, 8000.0 FROM clips
        UNION ALL SELECT id, 2, CAST(nf AS DOUBLE) FROM clips
        UNION ALL SELECT id, 3 + c, CAST(s AS DOUBLE) / nf FROM agg
        UNION ALL SELECT id, 3 + ch + c, SQRT(CAST(sq AS DOUBLE) / nf) FROM agg)
      SELECT CAST(id AS BIGINT) AS clip_id, CAST(pos AS INT) AS pos, stat
      FROM outp ORDER BY clip_id, pos"""),
    (s, dir) => {
      val clips: Seq[(Long, Array[Byte])] = Seq(
        0L -> operators.Multimodal.encodeWavG711(1, 8000, 256, (_, f) => f),
        1L -> operators.Multimodal.encodeWavG711(1, 8000, 256, (_, f) => f,
          aLaw = true),
        2L -> operators.Multimodal.encodeWavG711(2, 8000, 300,
          (c, f) => (f * 7 + c * 13) % 256),
        3L -> "junk".getBytes("UTF-8"))
      import s.implicits._
      clips.toDF("clip_id", "payload")
        .select(col("clip_id"),
          posexplode(operators.Multimodal.audioSampleStats(col("payload")))
            .as(Seq("pos", "stat")))
        .transform(Queries.sortedSmall(_, "clip_id", "pos"))
    })

  val all: Seq[Queries.Q] =
    Seq(qG711Stats)
}
