package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * BINARY payloads + typed metadata, processed per-partition in batches.
  *
  * The actual codec step is STUBBED (builder contract: media libraries are
  * not in this container) with a deterministic fake that derives metadata
  * arithmetically from the payload bytes — but the Spark-side plumbing is
  * real: binary columns, case-class encoders, `mapPartitions` batch shape,
  * and explode-based frame sampling, exactly what a real decoder would plug
  * into (swap `decodeStub` for the codec call).
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class DecodedMeta(
      doc_id: Long, byte_len: Long, width: Int, height: Int, n_frames: Int)

  /** STUB decode: deterministic fake metadata from payload size/bytes.
    * A real implementation would parse the container header here.
    */
  def decodeStub(r: MediaRow): DecodedMeta = {
    val len = r.payload.length.toLong
    DecodedMeta(
      doc_id = r.doc_id,
      byte_len = len,
      width = (len % 640).toInt + 16,
      height = (len % 480).toInt + 16,
      n_frames = (len % 24).toInt + 1)
  }

  /** Batch-decode via mapPartitions: one iterator pass per partition (the
    * shape a vectorized/batched codec needs), never a per-row UDF call.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** `documents.text` reinterpreted as a binary payload column — the
    * testdata stand-in for real media bytes.
    */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Frame sampling: every `step`-th frame index, exploded to one row per
    * sampled frame (distributed — no driver loop).
    */
  def sampleFrames(decoded: DataFrame, step: Int): DataFrame =
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))))
      .select("doc_id", "n_frames", "frame_idx")

  final case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** STUB feature extraction (the "embed the image" step): deterministic
    * arithmetic over payload length standing in for batched model
    * inference. Kept in `mapPartitions` — the iterator-per-partition shape
    * is exactly where a real encoder would batch rows onto an accelerator;
    * swap `featuresStub` for the model call.
    */
  def featuresStub(r: MediaRow): MediaFeatures = {
    val len = r.payload.length.toLong
    MediaFeatures(r.doc_id, Array.tabulate(16)(i => ((len * (i + 13)) % 997).toDouble / 997.0))
  }

  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(featuresStub))
  }

  /** REAL image decode — `javax.imageio` ships in the JDK, so the
    * PNG/JPEG/BMP/GIF path needs no external codec library: batched per
    * partition exactly like the stub. An unreadable payload decodes to
    * `(width, height) = (-1, -1)` instead of throwing — corrupt media
    * must not kill a 100 TB scan; filter `width >= 0` downstream and
    * count the rejects.
    */
  /** The shared decode-or-None discipline: an unreadable payload yields
    * None instead of throwing — corrupt media must not kill a 100 TB scan.
    * Every image path (meta, features, dHash) reads through this ONE
    * helper so the corrupt-media policy cannot fork.
    */
  private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case _: java.io.IOException => None }

  def decodeImage(r: MediaRow): DecodedMeta = readImage(r.payload) match {
    case None => DecodedMeta(r.doc_id, r.payload.length.toLong, -1, -1, 0)
    case Some(img) =>
      DecodedMeta(r.doc_id, r.payload.length.toLong, img.getWidth, img.getHeight, 1)
  }

  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeImage))
  }

  /** REAL pixel features: decode, downsample to a 4×4 grid of mean
    * grayscale values (nearest-pixel sampling — deterministic integer
    * arithmetic), one 16-dim vector per image. The shape a CLIP-style
    * encoder would fill; this one is an actual function of the pixels.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      readImage(r.payload).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val feats = Array.tabulate(16) { i =>
          val (gx, gy) = (i % 4, i / 4)
          val x = math.min(w - 1, gx * w / 4 + w / 8)
          val y = math.min(h - 1, gy * h / 4 + h / 8)
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
        }
        MediaFeatures(r.doc_id, feats)
      }
    })
  }

  final case class ImageHash(doc_id: Long, dhash: Long)

  /** REAL perceptual difference hash (dHash) from decoded pixels — the
    * classic image near-dup fingerprint: sample a 9×7 grayscale grid
    * (nearest-pixel, the [[imageFeatures]] clamp arithmetic) and set one
    * bit per horizontal neighbor pair where the right sample is brighter,
    * 8 comparisons × 7 rows = a 56-bit hash. 56 rather than the textbook
    * 64 keeps the value strictly non-negative in a signed 64-bit lane, so
    * the SQL oracle can assemble the identical integer with `<<`/`sum`
    * in exact BIGINT arithmetic on both engines. Unreadable payloads are
    * skipped (the decode discipline of [[decodeImages]]).
    */
  def imageDHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      readImage(r.payload).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        def gray(gx: Int, gy: Int): Int = {
          val x = math.min(w - 1, gx * w / 9 + w / 18)
          val y = math.min(h - 1, gy * h / 8 + h / 16)
          img.getRGB(x, y) & 0xff
        }
        var bits = 0L
        var gy = 0
        while (gy < 7) {
          var gx = 0
          while (gx < 8) {
            if (gray(gx + 1, gy) > gray(gx, gy)) bits |= 1L << (gy * 8 + gx)
            gx += 1
          }
          gy += 1
        }
        ImageHash(r.doc_id, bits)
      }
    })
  }

  /** Deterministic synthetic PNG for an id — the gates' media generator
    * (executor-side; `BufferedImage` + `ImageIO.write` are JDK-only).
    * Dimensions and the gray ramp are pure arithmetic over the id, so a
    * SQL oracle can predict every DECODED property without touching
    * image bytes.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (id % 50).toInt + 8
    val h = (id % 30).toInt + 8
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((id + x + y) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Resize planning: scale so the SHORTEST side hits `target`, preserving
    * aspect ratio, in pure integer arithmetic (`div` — floor division — so
    * the oracle can mirror it exactly). Metadata-only: a real resize would
    * consume (new_width, new_height) in the codec stage.
    */
  def resizePlan(decoded: DataFrame, target: Int): DataFrame =
    decoded
      .withColumn("min_side", least(col("width"), col("height")))
      .withColumn("new_width", expr(s"CAST((width * $target) DIV min_side AS INT)"))
      .withColumn("new_height", expr(s"CAST((height * $target) DIV min_side AS INT)"))
      .select("doc_id", "width", "height", "new_width", "new_height")

  // ---- REAL audio codec (javax.sound.sampled — JDK-only, like ImageIO) ----

  /** One row per (audio document, channel): container-level metadata plus
    * EXACT integer sample aggregates (sum of squares and peak absolute
    * value — integer so a SQL oracle can hash-match them; RMS is
    * `sqrt(sum_sq / frames)`, derivable downstream without float drift).
    */
  final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                             frames: Long, ch: Int, sum_sq: Long, peak_abs: Long)

  /** Deterministic synthetic 16-bit PCM WAV for an id, ENCODED by the
    * JDK's own `AudioSystem` writer (RIFF/fmt/data chunks), so the decode
    * side exercises a real codec round trip. Rate, channel count, frame
    * count, and every sample value are pure arithmetic over the id:
    * sample(frame i, channel c) = ((id + 7i + 13c) mod 2001) − 1000.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = 8000 + (id % 3).toInt * 4000
    val channels = 1 + (id % 2).toInt
    val frames = (id % 500).toInt + 100
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        val v = (((id + i.toLong * 7 + c.toLong * 13) % 2001) - 1000).toShort
        val off = (i * channels + c) * 2
        data(off) = (v & 0xff).toByte          // little-endian PCM
        data(off + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
      true /* signed */, false /* little-endian */)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode: `AudioSystem` parses the container (format, rate,
    * channel count, frame length), then one pass over the PCM bytes
    * accumulates the per-channel aggregates. Unreadable or non-16-bit-PCM
    * payloads yield a single `sample_rate = -1` marker row instead of
    * throwing — corrupt media must not kill a 100 TB scan.
    */
  def decodeWav(r: MediaRow): Seq[AudioMeta] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return Seq(AudioMeta(r.doc_id, -1, 0, 0L, 0, 0L, 0L))
      val channels = fmt.getChannels
      val rate = fmt.getSampleRate.toInt
      val frames = ais.getFrameLength
      val bytes = ais.readAllBytes()
      val sumSq = new Array[Long](channels)
      val peak = new Array[Long](channels)
      var i = 0
      val n = bytes.length / 2
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1)
        val v = (((hi << 8) | lo).toShort).toLong
        val c = i % channels
        sumSq(c) += v * v
        val a = math.abs(v)
        if (a > peak(c)) peak(c) = a
        i += 1
      }
      (0 until channels).map(c =>
        AudioMeta(r.doc_id, rate, channels, frames, c, sumSq(c), peak(c)))
    } catch {
      case scala.util.control.NonFatal(_) =>
        Seq(AudioMeta(r.doc_id, -1, 0, 0L, 0, 0L, 0L))
    }

  /** Batch audio decode — the same `mapPartitions` shape as the image
    * path; one row out per (document, channel).
    */
  def decodeWavs(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(decodeWav))
  }

  /** One row per audio document: channel-layout features over the REAL
    * decoded PCM — stereo energy imbalance (sum-of-squares left − right,
    * 0 for mono) and silence structure (total silent frames and the
    * longest consecutive silent run across channels, |sample| < threshold).
    * All exact integers, so a SQL oracle replaying the sample arithmetic
    * hash-matches the real decode path.
    */
  final case class AudioFeatures(doc_id: Long, channels: Int, frames: Long,
                                 imbalance: Long, n_silent: Long,
                                 max_silence_run: Long)

  /** Per-document channel-layout feature pass: one traversal of the
    * interleaved PCM tracking per-channel energy, silent-frame counts, and
    * the current/maximum silent RUN (frames are interleaved, so channel
    * `c`'s consecutive frames are samples `i, i+channels, …` — the run
    * state is per-channel). Unreadable payloads yield a `channels = 0`
    * marker row, the [[decodeWav]] corrupt-media contract.
    */
  def wavFeatures(r: MediaRow, silenceT: Int = 100): Seq[AudioFeatures] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return Seq(AudioFeatures(r.doc_id, 0, 0L, 0L, 0L, 0L))
      val channels = fmt.getChannels
      val frames = ais.getFrameLength
      val bytes = ais.readAllBytes()
      val sumSq = new Array[Long](channels)
      val nSilent = new Array[Long](channels)
      val curRun = new Array[Long](channels)
      val maxRun = new Array[Long](channels)
      var i = 0
      val n = bytes.length / 2
      while (i < n) {
        val lo = bytes(2 * i) & 0xff
        val hi = bytes(2 * i + 1)
        val v = (((hi << 8) | lo).toShort).toLong
        val c = i % channels
        sumSq(c) += v * v
        if (math.abs(v) < silenceT) {
          nSilent(c) += 1
          curRun(c) += 1
          if (curRun(c) > maxRun(c)) maxRun(c) = curRun(c)
        } else curRun(c) = 0
        i += 1
      }
      val imbalance = if (channels == 2) sumSq(0) - sumSq(1) else 0L
      Seq(AudioFeatures(r.doc_id, channels, frames, imbalance,
        nSilent.sum, if (maxRun.isEmpty) 0L else maxRun.max))
    } catch {
      case scala.util.control.NonFatal(_) =>
        Seq(AudioFeatures(r.doc_id, 0, 0L, 0L, 0L, 0L))
    }

  /** Batch channel-layout features — the same `mapPartitions` batched-codec
    * shape as every other decode path here.
    */
  def wavFeatureSet(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => wavFeatures(r)))
  }

  /** Mixdown + resample summary: the output-side aggregates of a
    * stereo→mono mixdown followed by integer DECIMATION to `target_rate` —
    * all exact integers so the SQL oracle replays the full
    * encode→decode→mixdown→resample chain arithmetically.
    */
  final case class ResampledAudio(doc_id: Long, src_rate: Int, channels: Int,
                                  in_frames: Long, out_frames: Long,
                                  out_sum: Long, out_sum_sq: Long,
                                  out_peak: Long)

  /** MIXDOWN + RESAMPLE over the REAL decoded PCM — the two normalization
    * passes an audio-curation pipeline runs before feature extraction
    * (uniform channel count, uniform rate):
    *
    *  - mixdown: stereo frames average to mono with integer division
    *    truncating toward zero (`(l + r) / 2` — deterministic for
    *    negative sums, and the SQL `//` convention); mono passes through;
    *  - resample: nearest-sample DECIMATION keeps frame `i` iff
    *    `⌊(i+1)·T/R⌋ > ⌊i·T/R⌋` (R = source rate, T = target) — evenly
    *    spaced, integer-exact, and the identity when T ≥ R (no
    *    interpolation is invented: this is a decimator, documented, not a
    *    polyphase filter).
    *
    * One pass over the interleaved PCM; output is the resampled signal's
    * aggregate summary (count/sum/sum-of-squares/peak), keeping the gate
    * hashable without shipping sample arrays. Unreadable payloads yield
    * the `channels = 0` marker row ([[decodeWav]]'s corrupt-media
    * contract).
    */
  def resampleMixdown(r: MediaRow, targetRate: Int): Seq[ResampledAudio] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return Seq(ResampledAudio(r.doc_id, -1, 0, 0L, 0L, 0L, 0L, 0L))
      val channels = fmt.getChannels
      val rate = fmt.getSampleRate.toInt
      val bytes = ais.readAllBytes()
      val frames = bytes.length / (2 * channels)
      var outN = 0L; var outSum = 0L; var outSq = 0L; var outPeak = 0L
      var i = 0
      while (i < frames) {
        val keep = (i + 1).toLong * targetRate / rate > i.toLong * targetRate / rate
        if (keep) {
          var acc = 0L; var c = 0
          while (c < channels) {
            val off = (i * channels + c) * 2
            acc += (((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort).toLong
            c += 1
          }
          val m = if (channels == 2) acc / 2L else acc
          outN += 1; outSum += m; outSq += m * m
          val a = math.abs(m); if (a > outPeak) outPeak = a
        }
        i += 1
      }
      Seq(ResampledAudio(r.doc_id, rate, channels, frames.toLong, outN,
        outSum, outSq, outPeak))
    } catch {
      case scala.util.control.NonFatal(_) =>
        Seq(ResampledAudio(r.doc_id, -1, 0, 0L, 0L, 0L, 0L, 0L))
    }

  /** Batch mixdown+resample — the shared `mapPartitions` codec shape. */
  def resampleSet(media: Dataset[MediaRow], targetRate: Int): Dataset[ResampledAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => resampleMixdown(r, targetRate)))
  }

  // ---- REAL multi-frame codec (animated GIF via ImageIO — JDK-only) ----
  //
  // The video-shaped operations (frame count, frame sampling, per-frame
  // features) run against a REAL container with a REAL codec: animated
  // GIF, the one multi-frame format the JDK reads and writes natively.
  // MP4/H.264 stays behind the documented stub (no JDK codec), but the
  // plumbing proven here — random-access per-frame decode inside
  // mapPartitions, sampling that touches ONLY the sampled frames — is
  // exactly what an ffmpeg-backed decoder would plug into.

  /** One row per SAMPLED frame: container dims + frame count, the sampled
    * frame's index, and its (0,0) gray value — all integers, so a SQL
    * oracle predicts the full encode→decode→sample pipeline arithmetically.
    */
  final case class FrameSample(doc_id: Long, width: Int, height: Int,
                               n_frames: Int, frame_idx: Int, gray: Int)

  /** Deterministic synthetic animated GIF for an id, encoded by ImageIO's
    * own sequence writer: `(id % 5) + 2` solid-gray frames of
    * `((id % 20) + 8) × ((id % 12) + 8)`, frame f's gray =
    * `(id + 17f) mod 256`. Solid frames round-trip exactly through GIF's
    * 256-entry palette — no quantization ambiguity.
    */
  def syntheticGif(id: Long): Array[Byte] = {
    val w = (id % 20).toInt + 8
    val h = (id % 12).toInt + 8
    val n = (id % 5).toInt + 2
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < n) {
        val g = ((id + 17L * f) % 256).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL frame sampling: decode ONLY every `step`-th frame via the GIF
    * reader's random-access `read(i)` — the point of sampling at 100 TB is
    * precisely that unsampled frames are never decoded. Corrupt payloads
    * yield a single `n_frames = 0` marker row instead of throwing.
    */
  def sampleGifFrames(media: Dataset[MediaRow], step: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    require(step > 0, "step must be positive")
    media.mapPartitions(_.flatMap { r =>
      try {
        val reader = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          (0 until n by step).map { i =>
            val img = reader.read(i)
            FrameSample(r.doc_id, img.getWidth, img.getHeight, n, i,
              img.getRGB(0, 0) & 0xff)
          }
        } finally { reader.dispose(); iis.close() }
      } catch {
        case scala.util.control.NonFatal(_) =>
          Seq(FrameSample(r.doc_id, -1, -1, 0, -1, -1))
      }
    })
  }
}
