package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  * The testdata has no real image/audio bytes, so the payload is the
  * utf-8 encoding of the document text and the "decode" is the
  * deterministic fake from [[Multimodal.FakeCodec]]; what's real
  * and tested here is the Spark-side shape — binary column, per-row
  * metadata extraction, stable content addressing.
  */
object MultimodalQueries extends QueryPack {

  import Multimodal.FakeCodec.{DimBase, DimMod, HeightMul}

  // q159 audio-gate knobs: 256-sample windows; a window is "silent"
  // below peak 500 and "clipped" at ≥ 1990 (the fake amp range is
  // [−2000, 2000], so 1990 is its full-scale analog).
  private val FrameSamples = 256
  private val SilenceThr = 500
  private val ClipThr = 1990

  // q185 dHash geometry: 6×11 luma grid → 6·10 = 60 gradient bits,
  // matching the wide-SimHash pigeonhole width.
  private val GridRows = 6
  private val GridCols = 11
  private val DHashMaxHamming = 3

  val queries: Map[String, Q] = Map(
    // The full multimodal pipeline through the correctness gate: REAL
    // mapPartitions decode (Multimodal.decodeImages — the batched-codec
    // shape) → aspect-preserving resize plan → frame sampling rollup.
    // The fake codec's dims are pure byte-length arithmetic, so the
    // oracle re-derives everything relationally; what the hash check
    // proves is that the partition-batched decode path and the
    // explode-based frame splitter produce exactly the declared rows.
    "q85_decode_resize" -> ((s, d) => {
      val payload = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val planned = Multimodal.resizePlan(
        Multimodal.decodeImages(payload), maxW = 32, maxH = 32)
      val frames = Multimodal.sampleFrames(payload, frameBytes = 256, stride = 2)
        .groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_frames"),
          sum(length(col("frame_bytes"))).as("frame_bytes_sum"))
      planned
        .select(col("doc_id"), col("width"), col("height"), col("scale"),
          col("out_width"), col("out_height"))
        .join(frames, Seq("doc_id"), "left")
    }),

    // Audio metadata through the real partition-batched decode kernel
    // (Multimodal.decodeAudio with the fake codec) + duration math on
    // top. The fake's checksum uses the mod-fold, so the oracle
    // reproduces the ENTIRE output including sample_acc — stronger
    // than q56/q85, which had to drop their wrap-fold checksums. The
    // real-media twin (JavaSoundCodec over generated WAV bytes) is
    // pinned by MultimodalSpec.
    "q134_audio_meta" -> ((s, d) => {
      val payload = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.decodeAudio(payload)
        .withColumn("duration_ms",
          expr("(n_samples * 1000) div sample_rate"))
    }),

    // Audio curation features on top of the per-window seam
    // (Multimodal.decodeAudioFrames): per-doc RMS energy, silence
    // ratio, peak amplitude and clipped-window count — the signals an
    // audio quality gate filters on. Thresholds are plan predicates
    // over the frame relation, not codec parameters; the fake twin's
    // integer-exact windows let the oracle reproduce every column
    // (the real-PCM twin, JavaSoundFrameCodec over a WAV with a known
    // silent half, is pinned by MultimodalSpec).
    "q159_audio_features" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val payload = docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val frames = Multimodal.decodeAudioFrames(payload, frameSamples = FrameSamples)
      val agg = frames.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_frames"),
        max(col("peak")).as("peak_amp"),
        sum(when(col("peak") < SilenceThr, 1L).otherwise(0L)).as("silent_frames"),
        sum(when(col("peak") >= ClipThr, 1L).otherwise(0L)).as("clip_frames"),
        sum(col("sum_sq")).as("sq"),
        sum(col("n_samples").cast(LongType)).as("ns"))
      docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_frames"), lit(0L)).as("n_frames"),
          col("peak_amp"),
          (col("silent_frames").cast(DoubleType) / col("n_frames")).as("silence_ratio"),
          coalesce(col("clip_frames"), lit(0L)).as("clip_frames"),
          when(col("ns") > 0,
            sqrt(col("sq").cast(DoubleType) / col("ns"))).as("rms"))
    }),

    // Perceptual near-dup detection over image payloads — dHash
    // (difference hash): a 6×11 luma grid through the codec seam, one
    // bit per adjacent-cell brightness gradient (60 bits — gradient
    // structure survives resizing and re-encoding, which is why dHash
    // and not a byte checksum is the image-dedup primitive), then the
    // SAME 60-bit pigeonhole banding machinery text SimHash uses
    // (Dedup.simhashPairs — hamming ≤ 3, no all-pairs join). The fake
    // codec's byte-sampled grid keeps the oracle exact; the REAL
    // ImageIoGridCodec twin (actual PNG decode → rec-601 luma grid) is
    // pinned by MultimodalSpec on generated images.
    "q185_image_dhash_pairs" -> ((s, d) => {
      val payload = Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val grid = Multimodal.decodeImageGrid(payload, rows = GridRows, cols = GridCols)
      val fp = grid.select(col("doc_id"),
        Multimodal.dHash(col("luma"), GridRows, GridCols).as("dhash"))
      Dedup.simhashPairs(fp, "doc_id", maxHamming = DHashMaxHamming, bits = 60)
    }),

    // The MULTIMODAL curation funnel — q132's composition extended
    // across modalities, per-source attrition at every gate: (1) text
    // quality ≥ 0.5 (quantized q94 score), (2) perceptual image dedup
    // (drop the larger id of every dHash hamming ≤ 3 pair among
    // survivors — pairwise min-id, the q166 rule), (3) audio gate (no
    // clipped windows, silent windows < half). Each stage rides an
    // operator the pack already ships; the funnel is their
    // composition, and the oracle recomputes all three gates from
    // scratch — so a green hash proves the COMPOSITION, not just the
    // parts.
    "q200_multimodal_funnel" -> ((s, d) => {
      import graft.functions.TextFunctions.qualityScore
      val docs = Tables.documents(s, d)
      val s1 = docs.withColumn("q6",
          floor(qualityScore(col("text"), TextQueries.EN) * 1e6).cast(LongType))
        .filter(col("q6") >= 500000L)
      val fp = Multimodal.decodeImageGrid(
          s1.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
          GridRows, GridCols)
        .select(col("doc_id"), Multimodal.dHash(col("luma"), GridRows, GridCols).as("dhash"))
      val dupIds = Dedup.simhashPairs(fp, "doc_id", DHashMaxHamming, bits = 60)
        .select(col("id_2").as("doc_id")).distinct()
      val s2 = s1.join(dupIds, Seq("doc_id"), "left_anti")
      val audioOk = Multimodal.decodeAudioFrames(
          s2.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
          FrameSamples)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nf"),
          sum(when(col("peak") < SilenceThr, 1L).otherwise(0L)).as("silent"),
          sum(when(col("peak") >= ClipThr, 1L).otherwise(0L)).as("clip"))
        .filter(col("clip") === 0L && col("silent") * 2 < col("nf"))
        .select(col("doc_id"))
      val s3 = s2.join(audioOk, Seq("doc_id"), "left_semi")
      def cnt(df: org.apache.spark.sql.DataFrame, name: String) =
        df.groupBy(col("source")).agg(count(lit(1)).as(name))
      cnt(docs, "n_total")
        .join(cnt(s1, "n_text"), Seq("source"), "left")
        .join(cnt(s2, "n_image"), Seq("source"), "left")
        .join(cnt(s3, "n_audio"), Seq("source"), "left")
        .select(col("source"), col("n_total"),
          coalesce(col("n_text"), lit(0L)).as("n_text"),
          coalesce(col("n_image"), lit(0L)).as("n_image"),
          coalesce(col("n_audio"), lit(0L)).as("n_audio"))
    }),

    // Binary payload + metadata extraction ("image header parse" stand-in):
    // byte length, fake dims derived from the bytes, content address.
    "q56_binary_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"), encode(col("text"), "UTF-8").as("payload"))
        .select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          (length(col("payload")) % DimMod + DimBase).as("fake_width"),
          ((length(col("payload")) * HeightMul) % DimMod + DimBase).as("fake_height"),
          substring(md5(col("text")), 1, 8).as("content_addr"))
        .withColumn("aspect",
          col("fake_width").cast(DoubleType) / col("fake_height").cast(DoubleType))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q85_decode_resize" ->
      s"""WITH p AS (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
         dims AS (SELECT doc_id,
                    CAST(nb % $DimMod + $DimBase AS INT) AS width,
                    CAST(nb * $HeightMul % $DimMod + $DimBase AS INT) AS height
                  FROM p),
         planned AS (SELECT doc_id, width, height,
                       LEAST(1.0, LEAST(CAST(32 AS DOUBLE) / width,
                                        CAST(32 AS DOUBLE) / height)) AS scale
                     FROM dims),
         frames AS (SELECT doc_id, count(*) AS n_frames,
                      CAST(SUM(LEAST(256, nb - i * 256)) AS BIGINT) AS frame_bytes_sum
                    FROM (SELECT doc_id, nb,
                            unnest(generate_series(0,
                              CAST(ceil(nb / 256.0) AS INT) - 1)) AS i
                          FROM p)
                    WHERE i % 2 = 0 GROUP BY doc_id)
       SELECT pl.doc_id, pl.width, pl.height, pl.scale,
              CAST(floor(pl.width * pl.scale) AS INT) AS out_width,
              CAST(floor(pl.height * pl.scale) AS INT) AS out_height,
              f.n_frames, f.frame_bytes_sum
       FROM planned pl LEFT JOIN frames f USING (doc_id)""",
    // The funnel's oracle recomputes all three gates from first
    // principles: q94's quantized quality expr, q185's fake-twin
    // dHash, q159's fake-twin audio windows.
    "q200_multimodal_funnel" -> {
      import Multimodal.FakeAudioFrameCodec.{AmpMod, AmpOff}
      val q6Sql = s"CAST(floor((least(1.0, CAST(${TextQueries.nTokensSql} AS DOUBLE)" +
        s" / 50.0) * (1.0 - ${TextQueries.stopRatioSql})) * 1000000.0) AS BIGINT)"
      val cells = GridRows * GridCols
      val lumaExpr = s"list_transform(generate_series(0, ${cells - 1}), " +
        "i -> ord(substr(text, ((7*i+3) % nb) + 1, 1)))"
      val dhBits = (0 until GridRows).flatMap { r =>
        (0 until GridCols - 1).map { c =>
          val j = r * (GridCols - 1) + c
          s"(CASE WHEN luma[${r * GridCols + c + 2}] > luma[${r * GridCols + c + 1}] " +
            s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
        }
      }.mkString(" + ")
      s"""WITH g AS (SELECT doc_id, source, text,
         |             octet_length(encode(text)) AS nb, $q6Sql AS q6
         |           FROM documents),
         |s1 AS (SELECT * FROM g WHERE q6 >= 500000),
         |lu AS (SELECT doc_id, $lumaExpr AS luma FROM s1),
         |dh AS (SELECT doc_id, CAST($dhBits AS BIGINT) AS dhash FROM lu),
         |dup AS (SELECT DISTINCT b.doc_id FROM dh a JOIN dh b
         |          ON a.doc_id < b.doc_id
         |        WHERE bit_count(xor(a.dhash, b.dhash)) <= $DHashMaxHamming),
         |s2 AS (SELECT * FROM s1
         |       WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
         |amps AS (SELECT doc_id,
         |           CAST((ord(substr(text, 2*i + 1, 1)) * 256 +
         |                 ord(substr(text, 2*i + 2, 1))) % $AmpMod - $AmpOff
         |                AS INT) AS amp, i
         |         FROM (SELECT doc_id, text,
         |                 unnest(generate_series(0, CAST(nb // 2 AS INT) - 1)) AS i
         |               FROM s2 WHERE nb >= 2)),
         |f AS (SELECT doc_id, CAST(i // $FrameSamples AS INT) AS w,
         |        MAX(abs(amp)) AS peak
         |      FROM amps GROUP BY 1, 2),
         |ok AS (SELECT doc_id FROM (
         |         SELECT doc_id, count(*) AS nf,
         |           SUM(CASE WHEN peak < $SilenceThr THEN 1 ELSE 0 END) AS silent,
         |           SUM(CASE WHEN peak >= $ClipThr THEN 1 ELSE 0 END) AS clip
         |         FROM f GROUP BY 1)
         |       WHERE clip = 0 AND silent * 2 < nf),
         |s3 AS (SELECT * FROM s2 WHERE doc_id IN (SELECT doc_id FROM ok))
         |SELECT t.source, t.n_total,
         |       COALESCE(a.n, 0) AS n_text,
         |       COALESCE(b.n, 0) AS n_image,
         |       COALESCE(c.n, 0) AS n_audio
         |FROM (SELECT source, CAST(count(*) AS BIGINT) AS n_total
         |      FROM documents GROUP BY 1) t
         |LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n
         |           FROM s1 GROUP BY 1) a USING (source)
         |LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n
         |           FROM s2 GROUP BY 1) b USING (source)
         |LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n
         |           FROM s3 GROUP BY 1) c USING (source)""".stripMargin
    },
    // Mirrors q185's fake twin exactly: byte-sampled luma grid via ord
    // (the corpus is ASCII, so character = utf-8 byte), 60 gradient
    // bits, all-pairs xor/bit_count at oracle scale (the Spark side
    // uses pigeonhole banding — same result set, never all-pairs).
    "q185_image_dhash_pairs" -> {
      val cells = GridRows * GridCols
      val lumaExpr = s"list_transform(generate_series(0, ${cells - 1}), " +
        "i -> ord(substr(text, ((7*i+3) % nb) + 1, 1)))"
      val bits = (0 until GridRows).flatMap { r =>
        (0 until GridCols - 1).map { c =>
          val j = r * (GridCols - 1) + c
          s"(CASE WHEN luma[${r * GridCols + c + 2}] > luma[${r * GridCols + c + 1}] " +
            s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
        }
      }.mkString(" + ")
      s"""WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
         g AS (SELECT doc_id, $lumaExpr AS luma FROM p),
         dh AS (SELECT doc_id, CAST($bits AS BIGINT) AS dhash FROM g)
       SELECT a.doc_id AS id_1, b.doc_id AS id_2,
              CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
       FROM dh a JOIN dh b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.dhash, b.dhash)) <= $DHashMaxHamming"""
    },
    "q56_binary_meta" ->
      s"""SELECT doc_id,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         CAST(octet_length(encode(text)) % $DimMod + $DimBase AS INT) AS fake_width,
         CAST(octet_length(encode(text)) * $HeightMul % $DimMod + $DimBase AS INT) AS fake_height,
         substr(md5(text), 1, 8) AS content_addr,
         CAST(octet_length(encode(text)) % $DimMod + $DimBase AS DOUBLE) /
           CAST(octet_length(encode(text)) * $HeightMul % $DimMod + $DimBase AS DOUBLE) AS aspect
         FROM documents""",
    // Mirrors q159's fake-twin windows: ASCII text → byte pairs →
    // centred amps → per-window integer features → doc-level gate
    // columns. The only doubles are one division and one sqrt over
    // exact integers, IEEE-identical on both engines.
    "q159_audio_features" -> {
      import Multimodal.FakeAudioFrameCodec.{AmpMod, AmpOff}
      s"""WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
         amps AS (SELECT doc_id,
                    CAST((ord(substr(text, 2*i + 1, 1)) * 256 +
                          ord(substr(text, 2*i + 2, 1))) % $AmpMod - $AmpOff AS INT) AS amp,
                    i
                  FROM (SELECT doc_id, text,
                          unnest(generate_series(0, CAST(nb // 2 AS INT) - 1)) AS i
                        FROM p WHERE nb >= 2)),
         f AS (SELECT doc_id, CAST(i // $FrameSamples AS INT) AS frame_idx,
                 count(*) AS n, SUM(CAST(amp AS BIGINT) * amp) AS sum_sq,
                 MAX(abs(amp)) AS peak
               FROM amps GROUP BY 1, 2),
         a AS (SELECT doc_id, count(*) AS n_frames, MAX(peak) AS peak_amp,
                 SUM(CASE WHEN peak < $SilenceThr THEN 1 ELSE 0 END) AS silent_frames,
                 SUM(CASE WHEN peak >= $ClipThr THEN 1 ELSE 0 END) AS clip_frames,
                 SUM(sum_sq) AS sq, SUM(n) AS ns
               FROM f GROUP BY 1)
       SELECT p.doc_id,
              CAST(coalesce(a.n_frames, 0) AS BIGINT) AS n_frames,
              CAST(a.peak_amp AS INT) AS peak_amp,
              CAST(a.silent_frames AS DOUBLE) / a.n_frames AS silence_ratio,
              CAST(coalesce(a.clip_frames, 0) AS BIGINT) AS clip_frames,
              sqrt(CAST(a.sq AS DOUBLE) / a.ns) AS rms
       FROM p LEFT JOIN a USING (doc_id)"""
    },
    // Mirrors q134: the corpus is ASCII, so ord over characters IS the
    // utf-8 byte sequence; the mod-fold keeps every intermediate under
    // 2^31 so BIGINT arithmetic never overflows.
    "q134_audio_meta" -> {
      import Multimodal.FakeAudioCodec.{AccMod, RateBase, RateMod, RateStep}
      s"""WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
         m AS (SELECT doc_id,
                 CAST($RateBase + (nb % $RateMod) * $RateStep AS INT) AS sample_rate,
                 CAST(1 + nb % 2 AS INT) AS n_channels,
                 CAST(nb // 2 AS BIGINT) AS n_samples,
                 CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(generate_series(1, len(text)),
                          i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
                      (h, v) -> (h * 31 + v) % $AccMod) AS BIGINT) AS sample_acc
               FROM p)
         SELECT doc_id, sample_rate, n_channels, n_samples, sample_acc,
                (n_samples * 1000) // sample_rate AS duration_ms
         FROM m"""
    }
  )
}
