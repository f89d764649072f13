package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.queries.Registry.t

/** Multimodal binary-column operators. The decode stub is deterministic
  * arithmetic over payload length, so even the mapPartitions path is
  * oracle-checkable in DuckDB (octet_length-based).
  */
object MultimodalQueries {

  val all: Map[String, GraftQuery] = Map(

    // Binary payload metadata: byte length + content hash.
    "mm1_binary_meta" -> GraftQuery(
      (s, dir) => t(s, dir, "documents")
        .select(
          col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
          md5(col("text").cast("binary")).as("content_md5")),
      // DuckDB octet_length needs BLOB; encode() is VARCHAR→BLOB (UTF-8).
      Some("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |       md5(text) AS content_md5
             |FROM documents""".stripMargin),
      "opaque binary payload: length + content hash"),

    // mapPartitions batch decode (stubbed codec) → typed metadata rows.
    "mm2_decode_meta" -> GraftQuery(
      (s, dir) => Multimodal.decode(Multimodal.mediaFromDocuments(s, dir)).toDF(),
      Some("""SELECT doc_id,
             |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |       CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
             |       CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height,
             |       CAST(octet_length(encode(text)) % 24 + 1 AS INT) AS n_frames
             |FROM documents""".stripMargin),
      "batched per-partition decode plumbing (stub codec)"),

    // Frame sampling: explode every 4th frame index per media row.
    "mm3_frame_sample" -> GraftQuery(
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.decode(Multimodal.mediaFromDocuments(s, dir)).toDF(), step = 4),
      Some("""SELECT doc_id, n_frames, CAST(f AS INT) AS frame_idx FROM (
             |  SELECT doc_id, n_frames, unnest(range(0, n_frames, 4)) AS f
             |  FROM (SELECT doc_id, CAST(octet_length(encode(text)) % 24 + 1 AS INT) AS n_frames
             |        FROM documents))""".stripMargin),
      "distributed frame sampling via explode(sequence)"),

    // Feature extraction (stub encoder) via the same mapPartitions batch
    // shape — integer-derived doubles, so even the array column is
    // bit-exactly oracle-checkable.
    // The gate output projects SCALAR probes of the feature vector (dim +
    // three components) so the driver's cell-stringify compare never sees
    // engine-specific array formatting; the mapPartitions array plumbing
    // itself is unchanged.
    "mm4_feature_extract" -> GraftQuery(
      (s, dir) => Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir)).toDF()
        .select(col("doc_id"), size(col("features")).as("dim"),
          element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 8).as("f7"),
          element_at(col("features"), 16).as("f15")),
      Some("""SELECT doc_id, 16 AS dim,
             |       CAST((octet_length(encode(text)) * 13) % 997 AS DOUBLE) / 997.0 AS f0,
             |       CAST((octet_length(encode(text)) * 20) % 997 AS DOUBLE) / 997.0 AS f7,
             |       CAST((octet_length(encode(text)) * 28) % 997 AS DOUBLE) / 997.0 AS f15
             |FROM documents""".stripMargin),
      "batched media feature extraction plumbing (stub encoder)"),

    // Resize planning: shortest side → 224, aspect preserved, floor-div
    // integer arithmetic mirrored exactly by the oracle.
    "mm5_resize_plan" -> GraftQuery(
      (s, dir) => Multimodal.resizePlan(
        Multimodal.decode(Multimodal.mediaFromDocuments(s, dir)).toDF(), target = 224),
      Some("""SELECT doc_id, width, height,
             |       CAST((width * 224) // least(width, height) AS INT) AS new_width,
             |       CAST((height * 224) // least(width, height) AS INT) AS new_height
             |FROM (SELECT doc_id,
             |             CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
             |             CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height
             |      FROM documents)""".stripMargin),
      "aspect-preserving resize planning in exact integer arithmetic"),

    // REAL codec round trip — no stub: synthetic PNGs are encoded
    // executor-side (BufferedImage + ImageIO.write, JDK-only), decoded
    // back through javax.imageio in the mapPartitions batch shape, and a
    // 4×4 grayscale-grid feature vector is computed from the ACTUAL
    // pixels. Every decoded property (dimensions, sampled grays) is pure
    // arithmetic over doc_id, so the oracle predicts the whole pipeline
    // without touching image bytes — a hash mismatch means the real
    // encode→decode→sample path broke.
    "mm6_image_decode" -> GraftQuery(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids.mapPartitions(_.map(id =>
          Multimodal.MediaRow(id, Multimodal.syntheticPng(id))))
        val meta = Multimodal.decodeImages(media).toDF()
          .select(col("doc_id"), col("width"), col("height"))
        val feats = Multimodal.imageFeatures(media).toDF()
          .select(col("doc_id"),
            round(expr("aggregate(features, 0D, (a, x) -> a + x)"), 6).as("gray_sum"))
        meta.join(feats, "doc_id")
      },
      Some("""SELECT d.doc_id,
             |       CAST(d.doc_id % 50 + 8 AS INT) AS width,
             |       CAST(d.doc_id % 30 + 8 AS INT) AS height,
             |       round((SELECT sum(((d.doc_id
             |                + least(d.doc_id % 50 + 8 - 1,
             |                        (i.i % 4) * (d.doc_id % 50 + 8) // 4
             |                          + (d.doc_id % 50 + 8) // 8)
             |                + least(d.doc_id % 30 + 8 - 1,
             |                        (i.i // 4) * (d.doc_id % 30 + 8) // 4
             |                          + (d.doc_id % 30 + 8) // 8)) % 256) / 255.0)
             |               FROM generate_series(0, 15) AS i(i)), 6) AS gray_sum
             |FROM documents d WHERE d.doc_id % 7 = 0""".stripMargin),
      "real ImageIO codec round trip: encode, batch-decode, pixel-grid features"),

    // REAL audio codec beside the image one: synthesize 16-bit PCM WAVs
    // with the JDK's own AudioSystem ENCODER (RIFF container), batch-decode
    // them with its DECODER, and aggregate the samples per channel with
    // exact integer arithmetic. Every decoded property — rate, channels,
    // frames, duration, per-channel sum-of-squares and peak — is pure
    // arithmetic over doc_id, so the DuckDB oracle predicts the whole
    // encode→decode→aggregate pipeline without touching audio bytes.
    "mm7_audio_decode" -> GraftQuery(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids.mapPartitions(_.map(id =>
          Multimodal.MediaRow(id, Multimodal.syntheticWav(id))))
        Multimodal.decodeWavs(media).toDF()
          .withColumn("duration_ms",
            expr("frames * 1000 DIV sample_rate"))
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS id,
             |         8000 + (doc_id % 3) * 4000 AS rate,
             |         1 + (doc_id % 2) AS nch,
             |         (doc_id % 500) + 100 AS frames
             |  FROM documents WHERE doc_id % 5 = 0),
             |s AS (
             |  SELECT p.id, p.rate, p.nch, p.frames, c.ch,
             |         ((p.id + g.i * 7 + c.ch * 13) % 2001) - 1000 AS v
             |  FROM p
             |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, p.nch - 1)) AS ch) c
             |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, p.frames - 1)) AS i) g)
             |SELECT id AS doc_id, CAST(rate AS INT) AS sample_rate,
             |       CAST(nch AS INT) AS channels, CAST(frames AS BIGINT) AS frames,
             |       CAST(ch AS INT) AS ch, CAST(sum(v * v) AS BIGINT) AS sum_sq,
             |       CAST(max(abs(v)) AS BIGINT) AS peak_abs,
             |       CAST(frames * 1000 // rate AS BIGINT) AS duration_ms
             |FROM s GROUP BY id, rate, nch, frames, ch""".stripMargin),
      "real WAV codec round trip: AudioSystem encode, batch-decode, exact per-channel aggregates"),

    // REAL multi-frame (video-shaped) codec: synthesize animated GIFs
    // executor-side with ImageIO's sequence writer, then FRAME-SAMPLE them
    // with its reader — random-access read(i) decodes ONLY every 2nd
    // frame, which is the entire point of sampling at scale. Dimensions,
    // frame counts, and each sampled frame's gray value are arithmetic
    // over doc_id, so the oracle predicts the encode→decode→sample
    // pipeline without touching media bytes. MP4 stays a documented stub
    // (no JDK codec); the plumbing is what ffmpeg would plug into.
    "mm8_video_frames" -> GraftQuery(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids.mapPartitions(_.map(id =>
          Multimodal.MediaRow(id, Multimodal.syntheticGif(id))))
        Multimodal.sampleGifFrames(media, step = 2).toDF()
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS id, (doc_id % 20) + 8 AS w, (doc_id % 12) + 8 AS h,
             |         (doc_id % 5) + 2 AS n
             |  FROM documents WHERE doc_id % 7 = 0),
             |f AS (
             |  SELECT id, w, h, n, g.i AS frame_idx
             |  FROM p CROSS JOIN LATERAL
             |    (SELECT unnest(generate_series(0, n - 1, 2)) AS i) g)
             |SELECT id AS doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |       CAST(n AS INT) AS n_frames, CAST(frame_idx AS INT) AS frame_idx,
             |       CAST((id + 17 * frame_idx) % 256 AS INT) AS gray
             |FROM f""".stripMargin),
      "real multi-frame codec: animated-GIF encode, random-access frame sampling"),

    // Channel-layout audio features on the mm7 REAL-codec path: stereo
    // energy imbalance (left sum-of-squares − right, 0 for mono) and
    // silence structure (total silent frames + the longest consecutive
    // silent run across channels, |sample| < 100) — the features an audio
    // curation pipeline gates on (dead channels, silence-padded clips).
    // One pass over the decoded interleaved PCM per document; the run
    // state is per-channel because frames interleave. All outputs are
    // exact integers and every sample value is arithmetic over doc_id, so
    // the DuckDB oracle replays the silence runs with gaps-and-islands
    // (i − row_number) over the synthesized samples and hash-matches the
    // REAL AudioSystem encode→decode→feature pipeline.
    "mm9_audio_features" -> GraftQuery(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids.mapPartitions(_.map(id =>
          Multimodal.MediaRow(id, Multimodal.syntheticWav(id))))
        Multimodal.wavFeatureSet(media).toDF()
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS id, 1 + (doc_id % 2) AS nch,
             |         (doc_id % 500) + 100 AS frames
             |  FROM documents WHERE doc_id % 5 = 0),
             |s AS (
             |  SELECT p.id, p.nch, p.frames, c.ch, g.i,
             |         ((p.id + g.i * 7 + c.ch * 13) % 2001) - 1000 AS v
             |  FROM p
             |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, p.nch - 1)) AS ch) c
             |  CROSS JOIN LATERAL (SELECT unnest(generate_series(0, p.frames - 1)) AS i) g),
             |energy AS (
             |  SELECT id, CASE WHEN max(nch) = 2
             |               THEN sum(CASE WHEN ch = 0 THEN v * v ELSE -(v * v) END)
             |               ELSE 0 END AS imbalance
             |  FROM s GROUP BY id),
             |sil AS (
             |  SELECT id, ch, i, i - row_number() OVER (PARTITION BY id, ch ORDER BY i) AS grp
             |  FROM s WHERE abs(v) < 100),
             |runs AS (SELECT id, ch, count(*) AS runlen FROM sil GROUP BY id, ch, grp),
             |silagg AS (SELECT id, sum(runlen) AS n_silent, max(runlen) AS max_run
             |           FROM runs GROUP BY id)
             |SELECT p.id AS doc_id, CAST(p.nch AS INT) AS channels,
             |       CAST(p.frames AS BIGINT) AS frames,
             |       CAST(e.imbalance AS BIGINT) AS imbalance,
             |       CAST(coalesce(sa.n_silent, 0) AS BIGINT) AS n_silent,
             |       CAST(coalesce(sa.max_run, 0) AS BIGINT) AS max_silence_run
             |FROM p JOIN energy e ON e.id = p.id
             |LEFT JOIN silagg sa ON sa.id = p.id""".stripMargin),
      "channel-layout audio features: stereo imbalance + silence runs over real decoded PCM"),

    // MIXDOWN + RESAMPLE on the mm7 REAL-codec path — the normalization
    // passes an audio-curation pipeline runs before features (uniform
    // channel count, uniform rate): stereo averages to mono with integer
    // division truncating toward zero (the SQL `//` convention), then
    // nearest-sample decimation to 8 kHz keeps frame i iff
    // ⌊(i+1)·T/R⌋ > ⌊i·T/R⌋ (identity when the source is already 8 kHz —
    // an honest decimator, no invented interpolation). The synthetic
    // corpus spans all three rates (8/12/16 kHz) and both layouts, so
    // passthrough, 2:3, and 1:2 decimation plus both mixdown arms all
    // execute; outputs are exact integer aggregates of the resampled
    // signal, and the DuckDB oracle replays the whole REAL
    // encode→decode→mixdown→decimate chain arithmetically from doc_id.
    "mm10_audio_resample" -> GraftQuery(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").filter(col("doc_id") % 5 === 1)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids.mapPartitions(_.map(id =>
          Multimodal.MediaRow(id, Multimodal.syntheticWav(id))))
        Multimodal.resampleSet(media, targetRate = 8000).toDF()
      },
      Some("""WITH p AS (
             |  SELECT doc_id AS id, 8000 + (doc_id % 3) * 4000 AS rate,
             |         1 + (doc_id % 2) AS nch, (doc_id % 500) + 100 AS frames
             |  FROM documents WHERE doc_id % 5 = 1),
             |m AS (
             |  SELECT p.id, p.rate, p.nch, p.frames, g.i,
             |         CASE WHEN p.nch = 2
             |           THEN ((((p.id + g.i * 7) % 2001) - 1000)
             |               + (((p.id + g.i * 7 + 13) % 2001) - 1000)) // 2
             |           ELSE ((p.id + g.i * 7) % 2001) - 1000 END AS v
             |  FROM p CROSS JOIN LATERAL
             |    (SELECT unnest(generate_series(0, p.frames - 1)) AS i) g
             |  WHERE (g.i + 1) * 8000 // p.rate > g.i * 8000 // p.rate)
             |SELECT p.id AS doc_id, CAST(p.rate AS INT) AS src_rate,
             |       CAST(p.nch AS INT) AS channels,
             |       CAST(p.frames AS BIGINT) AS in_frames,
             |       CAST(count(m.i) AS BIGINT) AS out_frames,
             |       CAST(coalesce(sum(m.v), 0) AS BIGINT) AS out_sum,
             |       CAST(coalesce(sum(m.v * m.v), 0) AS BIGINT) AS out_sum_sq,
             |       CAST(coalesce(max(abs(m.v)), 0) AS BIGINT) AS out_peak
             |FROM p LEFT JOIN m ON m.id = p.id
             |GROUP BY p.id, p.rate, p.nch, p.frames""".stripMargin),
      "audio mixdown + resample: floor-div stereo average, nearest-sample decimation, oracle-replayed"),

    // IMAGE NEAR-DUP DEDUP via perceptual dHash — the multimodal leg of
    // the dedup family: real ImageIO decode → 56-bit difference hash from
    // ACTUAL pixels (Multimodal.imageDHash) → banded candidate join
    // (4 × 14-bit bands, the d5 SimHash scale discipline — never an
    // all-pairs scan; pigeonhole makes band-sharing EXACT for distance
    // ≤ 3, a recall-high heuristic beyond that, the standard LSH
    // candidate contract) → exact hamming via bit_count(xor) ≤ 14 over
    // the candidates (56-bit random pairs expect ~28) → per-image
    // neighbor census. The census is over banded candidates BY CONTRACT,
    // and the oracle replays band split and hamming identically, so both
    // engines compute the same well-defined quantity. Synthetic same-dimension images differ by a constant gray
    // shift, so genuine near-pairs exist; every decoded gray is pure
    // arithmetic over doc_id, so DuckDB replays hash, bands, and hamming
    // integer-for-integer without touching image bytes.
    "mm11_image_neardup" -> GraftQuery(
      (s, dir) => {
        import s.implicits._
        val ids = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
          .select(col("doc_id").cast("long")).as[Long]
        val media = ids.mapPartitions(_.map(id =>
          Multimodal.MediaRow(id, Multimodal.syntheticPng(id))))
        val dh = Multimodal.imageDHash(media).toDF()
        val bands = dh.select(col("doc_id"), col("dhash"),
          explode(array((0 until 4).map(i => struct(lit(i).as("bi"),
            shiftright(col("dhash"), 14 * i).bitwiseAND(lit(16383L)).as("bv"))): _*)).as("b"))
          .select(col("doc_id"), col("dhash"), col("b.bi"), col("b.bv"))
        val cand = bands.alias("a")
          .join(bands.alias("b"),
            col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            col("a.dhash").as("ha"), col("b.dhash").as("hb"))
          .distinct()
        val near = cand
          .withColumn("d", expr("bit_count(ha ^ hb)").cast("long"))
          .filter(col("d") <= 14)
        near.select(col("da").as("doc_id"), col("d"))
          .unionByName(near.select(col("db").as("doc_id"), col("d")))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_near"), min("d").as("best_d"))
          .orderBy("doc_id")
      },
      Some("""WITH imgs AS (
             |  SELECT doc_id, CAST(doc_id % 50 + 8 AS BIGINT) AS w,
             |         CAST(doc_id % 30 + 8 AS BIGINT) AS h
             |  FROM documents WHERE doc_id % 5 = 0),
             |bits AS (
             |  SELECT i.doc_id, g.gy * 8 + g.gx AS b,
             |         CASE WHEN ((i.doc_id
             |                     + least(i.w - 1, (g.gx + 1) * i.w // 9 + i.w // 18)
             |                     + least(i.h - 1, g.gy * i.h // 8 + i.h // 16)) % 256)
             |                 > ((i.doc_id
             |                     + least(i.w - 1, g.gx * i.w // 9 + i.w // 18)
             |                     + least(i.h - 1, g.gy * i.h // 8 + i.h // 16)) % 256)
             |              THEN 1 ELSE 0 END AS bit
             |  FROM imgs i CROSS JOIN
             |    (SELECT t1.gx, t2.gy FROM generate_series(0, 7) t1(gx),
             |                              generate_series(0, 6) t2(gy)) g),
             |dh AS (
             |  SELECT doc_id,
             |         CAST(sum(CASE WHEN bit = 1 THEN (1::BIGINT << b) ELSE 0 END)
             |              AS BIGINT) AS dhash
             |  FROM bits GROUP BY doc_id),
             |bands AS (
             |  SELECT doc_id, dhash, t.bi, (dhash >> (14 * t.bi)) & 16383 AS bv
             |  FROM dh CROSS JOIN generate_series(0, 3) t(bi)),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
             |                  a.dhash AS ha, b.dhash AS hb
             |  FROM bands a JOIN bands b
             |    ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id),
             |near AS (
             |  SELECT da, db, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS d
             |  FROM cand WHERE bit_count(xor(ha, hb)) <= 14),
             |sym AS (SELECT da AS doc_id, d FROM near
             |        UNION ALL SELECT db AS doc_id, d FROM near)
             |SELECT doc_id, count(*) AS n_near, CAST(min(d) AS BIGINT) AS best_d
             |FROM sym GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "image near-dup dedup: real-pixel perceptual dHash, banded candidates, exact hamming census"),
  )
}
