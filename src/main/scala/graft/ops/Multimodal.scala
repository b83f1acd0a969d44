package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media asset: opaque binary payload + typed metadata. Modality is a
  * plain string column so partition pruning / predicate pushdown work on
  * it; the payload stays opaque binary end-to-end (never parsed by the
  * engine, never part of a shuffle key).
  */
final case class MediaRow(
    doc_id: Long,
    modality: String,          // image | audio | video
    payload: Array[Byte],      // raw encoded bytes (jpeg/wav/mp4/…)
    width: Int, height: Int,   // image/video metadata
    sample_rate: Int)          // audio metadata

final case class MediaFeatures(
    doc_id: Long,
    modality: String,
    n_bytes: Long,
    checksum: Long,
    feature: Array[Float])     // extracted feature vector

final case class ResizedImage(
    doc_id: Long,
    src_w: Int, src_h: Int,    // before
    dst_w: Int, dst_h: Int,    // after (aspect-preserving fit, no upscale)
    out_bytes: Long)           // re-encoded size (PNG) / raw-frame estimate (stub)

/** Multimodal-column plumbing (SURVEY §2C m1). PNG payloads take a REAL
  * decode path (`javax.imageio`) and WAV payloads a real one too
  * (`javax.sound.sampled`) — both pure JVM, no native codecs needed;
  * other formats (jpeg/mp4 need libs absent from this container)
  * fall back to a clearly-marked deterministic stub. Everything
  * Spark-side is real and load-bearing either way: the typed schema, the
  * batched partition-wise extraction (the Scala analogue of
  * `mapInPandas`: one decoder init per partition, streamed batches,
  * never materializing a partition in memory), and the downstream
  * aggregation shape.
  */
object Multimodal {

  private def isPng(payload: Array[Byte]): Boolean =
    payload.length > 8 &&
      payload(0) == 0x89.toByte && payload(1) == 'P' &&
      payload(2) == 'N' && payload(3) == 'G'

  /** Real decode for PNG bytes: 8-dim feature =
    * [width, height, mean R, mean G, mean B, min luma, max luma,
    * sampled-pixel count]. Pixels are visited on a deterministic stride
    * capped at ~4096 samples, so the cost per asset is bounded no matter
    * the resolution (the contract a 100 TB media scan needs — decode
    * cost must not scale with the largest asset).
    */
  private def extractPng(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    // ImageIO.read returns null when no reader claims the stream but
    // THROWS (IIOException) on a claimed-but-corrupt body — both must
    // degrade to the stub fold, never kill the task (a 100 TB media scan
    // always contains some truncated payloads)
    scala.util.Try(
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    ).toOption.flatten.map { img =>
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      val stride = math.max(1L, n / 4096L).toInt
      var i = 0L; var cnt = 0L
      var sr = 0.0; var sg = 0.0; var sb = 0.0
      var minL = Float.MaxValue; var maxL = Float.MinValue
      while (i < n) {
        val rgb = img.getRGB((i % w).toInt, (i / w).toInt)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val luma = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
        if (luma < minL) minL = luma
        if (luma > maxL) maxL = luma
        cnt += 1
        i += stride
      }
      val out = new Array[Float](dim)
      out(0) = w.toFloat; out(1) = h.toFloat
      out(2) = (sr / cnt / 255.0).toFloat
      out(3) = (sg / cnt / 255.0).toFloat
      out(4) = (sb / cnt / 255.0).toFloat
      out(5) = minL; out(6) = maxL
      out(7) = cnt.toFloat
      out
    }

  private def isWav(payload: Array[Byte]): Boolean =
    payload.length > 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A' &&
      payload(10) == 'V' && payload(11) == 'E'

  /** Real decode for WAV bytes (`javax.sound.sampled` — pure JVM, same
    * zero-dependency argument as the PNG path): 8-dim feature =
    * [sample rate, channels, bits/sample, frame count, duration seconds,
    * mean |amplitude|, peak |amplitude|, sampled frame count]. Amplitude
    * stats come from the FIRST ≤4096 frames (16/8-bit PCM) — a bounded
    * deterministic prefix, so decode cost per asset is O(1) no matter
    * the clip length, the same contract as [[extractPng]]'s stride cap.
    * Multi-channel frames are averaged to one amplitude per frame, so
    * out(7) counts FRAMES (not interleaved samples) for any channel
    * count.
    */
  private def extractWav(payload: Array[Byte], dim: Int): Option[Array[Float]] =
    scala.util.Try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val sampleFrames = math.min(frames, 4096L).toInt
        val buf = new Array[Byte](sampleFrames * fmt.getFrameSize)
        var read = 0
        var r = ais.read(buf, 0, buf.length)
        while (r > 0 && read + r < buf.length) { read += r; r = ais.read(buf, read, buf.length - read) }
        if (r > 0) read += r
        // frame-wise walk: each frame's CHANNELS ARE AVERAGED into one
        // amplitude before the stats, so out(5..7) are genuinely
        // per-FRAME (a stereo clip is not double-counted and its
        // interleaved L/R values never fold into one stream); for mono
        // this is byte-identical to a flat sample walk
        var sumAbs = 0.0; var peak = 0.0; var cnt = 0L
        val le = !fmt.isBigEndian
        val bytesPerSample = bits / 8
        val frameSize = bytesPerSample * ch
        var i = 0
        while (i + frameSize <= read) {
          var chSum = 0.0
          var c = 0
          while (c < ch) {
            val o = i + c * bytesPerSample
            val v =
              if (bits == 16) {
                val lo = buf(if (le) o else o + 1) & 0xff
                val hi = buf(if (le) o + 1 else o)
                ((hi << 8) | lo).toShort / 32768.0
              } else (buf(o) & 0xff) / 255.0 * 2 - 1 // 8-bit PCM is unsigned
            chSum += v
            c += 1
          }
          val a = math.abs(chSum / ch)
          sumAbs += a; if (a > peak) peak = a; cnt += 1
          i += frameSize
        }
        val out = new Array[Float](dim)
        out(0) = fmt.getSampleRate
        out(1) = ch.toFloat
        out(2) = bits.toFloat
        out(3) = frames.toFloat
        out(4) = if (fmt.getFrameRate > 0) frames / fmt.getFrameRate else 0f
        out(5) = if (cnt > 0) (sumAbs / cnt).toFloat else 0f
        out(6) = peak.toFloat
        out(7) = cnt.toFloat
        out
      } finally ais.close()
    }.toOption

  /** Decode + feature extraction: PNG payloads decode for real
    * (`javax.imageio`) and WAV payloads decode for real
    * (`javax.sound.sampled`); everything else is the STUB fold — a
    * production build swaps that branch for libjpeg/ffmpeg handles (init
    * per partition in [[extractFeatures]]). The signature — bytes in,
    * fixed-width float feature out — is the contract the pipeline is
    * built against; all branches are deterministic on payload bytes so
    * tests are stable.
    */
  private def decodeAndExtract(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    if (isPng(payload)) extractPng(payload, dim) match {
      case Some(f) => return f
      case None    => () // corrupt PNG: fall through to the byte fold
    }
    if (isWav(payload)) extractWav(payload, dim) match {
      case Some(f) => return f
      case None    => () // corrupt WAV: fall through to the byte fold
    }
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  private def checksum(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  /** Synthesize a media table from `documents` (payload = utf-8 bytes of
    * the text standing in for encoded media; deterministic modality).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0).as("sample_rate"))
      .as[MediaRow]
  }

  /** Batched partition-wise feature extraction. mapPartitions (not map)
    * so a real decoder/model is initialized once per partition and the
    * iterator streams — constant memory per task regardless of partition
    * size, the property that matters when payloads are MBs each.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // [real build: init decoder/model handle here, once per partition]
      rows.map { r =>
        MediaFeatures(
          doc_id = r.doc_id,
          modality = r.modality,
          n_bytes = r.payload.length.toLong,
          checksum = checksum(r.payload),
          feature = decodeAndExtract(r.payload))
      }
    }
  }

  /** Full per-asset extraction output including the engine-specific
    * columns: `checksum` uses wrap-around long arithmetic and `feat_l1`
    * is an f32 fold — deterministic within Spark (spec-checked) but not
    * reproducible in SQL, so they stay out of the oracle-checked entry.
    */
  def m1_features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .toDF()
      .withColumn("feat_l1", round(expr(
        "aggregate(feature, CAST(0 AS DOUBLE), (acc, x) -> acc + x)"), 4))
      .withColumn("feat_dim", size(col("feature")).cast("long"))
      .select("doc_id", "modality", "n_bytes", "checksum", "feat_l1", "feat_dim")
      .orderBy("doc_id")

  /** m1_multimodal — end-to-end: synthesize media, extract features
    * partition-wise, emit the integer-exact per-asset contract (id,
    * modality routing, payload byte count, feature width). Every row
    * passes through the real mapPartitions extraction path, so the oracle
    * proves the plumbing delivers each asset exactly once with intact
    * payload length and a fixed-width feature vector; the non-portable
    * checksum/feat_l1 columns live in `m1_features` (spec-checked). [oracle]
    */
  def m1_multimodal(spark: SparkSession, dir: String): DataFrame =
    m1_features(spark, dir)
      .select("doc_id", "modality", "n_bytes", "feat_dim")
      .orderBy("doc_id")

  /** DuckDB mirror of m1's integer-exact contract: payload bytes =
    * octet_length of the utf-8 text (the payload IS that encoding),
    * modality = the same doc_id routing, feat_dim = the fixed 8.
    */
  val m1_oracle: String =
    """SELECT doc_id,
      |  (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(8 AS BIGINT) AS feat_dim
      |FROM documents ORDER BY doc_id""".stripMargin

  /** m2_media_stats — per-modality corpus statistics over the typed media
    * schema: asset counts, payload bytes (binary length), pixel and
    * sample-rate metadata aggregates. The governance/capacity-planning
    * summary a media lake runs before any decode; all-integer, so unlike
    * m1 it is hash-checked cross-engine. [oracle]
    */
  def m2_media_stats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("payload"))).cast("long").as("total_bytes"),
        sum((col("width") * col("height")).cast("long")).cast("long").as("total_pixels"),
        max(col("sample_rate")).cast("long").as("max_rate"))
      .orderBy("modality")

  /** Aspect-preserving fit of (w, h) into a `box`×`box` square, integer
    * arithmetic (truncating division — floors for positive dims, same in
    * SQL `//`), never upscaling, never collapsing a dimension below 1.
    */
  private[ops] def fitDims(w: Int, h: Int, box: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= box) (w, h)
    else (math.max(1, w * box / m), math.max(1, h * box / m))
  }

  /** Batched partition-wise image resize. PNG payloads resize FOR REAL
    * (decode via javax.imageio → Graphics2D bilinear scale → PNG
    * re-encode — pure JVM); formats whose codecs this container lacks
    * keep the stub: target dims from the typed metadata via the same
    * [[fitDims]] arithmetic, out_bytes = the raw-RGB frame estimate.
    * Same mapPartitions discipline as [[extractFeatures]] (scaler state
    * init once per partition, streaming iterator, payloads never in a
    * shuffle key).
    */
  def resizeImages(media: Dataset[MediaRow], box: Int = 224): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "image").mapPartitions { rows =>
      // [real build: decoder + scaler handles init here, once per partition]
      rows.map { r =>
        val real = scala.util.Try(
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
        ).toOption.flatten.map { img =>
          val (dw, dh) = fitDims(img.getWidth, img.getHeight, box)
          val dst = new java.awt.image.BufferedImage(
            dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, dw, dh, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          ResizedImage(r.doc_id, img.getWidth, img.getHeight, dw, dh, bos.size().toLong)
        }
        real.getOrElse {
          val (dw, dh) = fitDims(r.width, r.height, box)
          ResizedImage(r.doc_id, r.width, r.height, dw, dh, dw.toLong * dh * 3)
        }
      }
    }
  }

  /** m4_resize — the resize stage of image ingest as an oracle-checked
    * entry: every image asset flows through [[resizeImages]]'s real
    * partition-wise path, and the emitted contract (source dims, target
    * dims, output-size estimate) is recomputed by the oracle from the
    * metadata formulas — pinning the aspect-preserving integer
    * arithmetic (no upscale, truncating division, ≥1 px) cross-engine.
    * [oracle]
    */
  /** Deterministic 16-bit PCM mono WAV: a square wave whose half-period,
    * length and amplitude derive from the asset id — standing in for
    * audio bytes read from a lake column, while keeping every waveform
    * stat computable in closed form from the id (the m4 discipline: the
    * synth is the fixture, the DECODE is the real production path).
    */
  private[ops] def synthWav(docId: Long): Array[Byte] = {
    val sr = 8000
    val n = (800 + (docId % 5) * 80).toInt
    val half = (8 + (docId % 7) * 4).toInt
    val amp = (1000 + (docId % 3) * 500).toInt
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = if ((i / half) % 2 == 0) amp else -amp
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Full-clip waveform stats off a real `javax.sound.sampled` decode:
    * sample rate, frame count, peak |amplitude|, and zero crossings
    * (sign changes between consecutive frames) — the audio-quality
    * features (silence/clipping/frequency proxies) an audio curation
    * pipeline filters on.
    */
  private[ops] def wavStats(payload: Array[Byte]): (Long, Long, Long, Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val sr = ais.getFormat.getSampleRate.toLong
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      var peak = 0L
      var cross = 0L
      var prev = 0
      var i = 0
      while (i < n) {
        val v = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
        if (math.abs(v) > peak) peak = math.abs(v)
        if (i > 0 && (v < 0) != (prev < 0)) cross += 1
        prev = v
        i += 1
      }
      (sr, n.toLong, peak, cross)
    } finally ais.close()
  }

  /** m8_audio_dedup — perceptual audio dedup for the media lake: a
    * 60-bit SIGN FINGERPRINT (bit j = "is the decoded sample at frame
    * 4·j positive") computed from the REAL `javax.sound` decode of each
    * clip's WAV bytes, then an exact group-by on the fingerprint — two
    * clips that differ only in loudness (amplitude) or duration
    * (trailing frames past the probe window) collide, which is exactly
    * the perceptual equivalence an audio dedup pass wants, while any
    * waveform/phase difference separates them. Per group: clip count,
    * keep-first representative, and the PCM bytes a content-addressed
    * store reclaims (group total minus the representative's).
    *
    * Scale shape: m6's discipline — the decode runs in the narrow scan
    * and only (8-byte fingerprint, byte count) leave the task; the
    * group-by is linear in the lake, no pair join exists at all. The
    * synth square wave makes every fingerprint closed-form from the
    * asset id, so the oracle recomputes fingerprint AND reclaim without
    * decoding a sample — any Spark-side decode asymmetry (endianness,
    * sign, header skip) breaks the hash (m5's discipline, composed into
    * dedup). [oracle]
    */
  def m8_audio_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fps = Tables(spark, dir).documents.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(synthWav(id)))
          val bytes = try ais.readAllBytes() finally ais.close()
          val n = bytes.length / 2
          var fp = 0L
          var j = 0
          while (j < 60) {
            val i = 4 * j
            val v = (((bytes(2 * i + 1) & 0xff) << 8) |
              (bytes(2 * i) & 0xff)).toShort.toInt
            if (v > 0) fp |= (1L << j)
            j += 1
          }
          (id, fp, n.toLong * 2)
        }
      }.toDF("doc_id", "fingerprint", "pcm_bytes")
    fps.groupBy("fingerprint").agg(
        count(lit(1)).as("n_clips"),
        min("doc_id").as("keep_doc"),
        countDistinct("pcm_bytes").as("n_lengths"),
        sum("pcm_bytes").cast("long").as("pcm_bytes_total"),
        (sum("pcm_bytes") - expr("min_by(pcm_bytes, doc_id)")).cast("long")
          .as("pcm_bytes_reclaimed"))
      .orderBy("fingerprint")
  }

  /** DuckDB mirror of m8: fingerprint and sizes in closed form from the
    * synth parameters (sample at frame i is +amp iff (i DIV half) is
    * even; the probe window 4·j ≤ 236 < every clip's frame count).
    */
  val m8_oracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    8 + (doc_id % 7) * 4 AS half,
      |    800 + (doc_id % 5) * 80 AS n
      |  FROM documents),
      |js AS (SELECT unnest(range(0, 60)) AS j),
      |fp AS (
      |  SELECT doc_id, CAST(n * 2 AS BIGINT) AS pcm_bytes,
      |    CAST(SUM(CASE WHEN ((4 * j // half) % 2) = 0
      |      THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS fingerprint
      |  FROM d CROSS JOIN js GROUP BY doc_id, n)
      |SELECT fingerprint, COUNT(*) AS n_clips, MIN(doc_id) AS keep_doc,
      |  COUNT(DISTINCT pcm_bytes) AS n_lengths,
      |  CAST(SUM(pcm_bytes) AS BIGINT) AS pcm_bytes_total,
      |  CAST(SUM(pcm_bytes) - min_by(pcm_bytes, doc_id) AS BIGINT)
      |    AS pcm_bytes_reclaimed
      |FROM fp GROUP BY fingerprint ORDER BY fingerprint""".stripMargin

  /** m5_audio_features — waveform analytics end-to-end: every asset's
    * WAV bytes decode through the REAL javax.sound path inside the
    * mapPartitions batcher (decoder state per partition, iterator
    * streams — constant memory however large the clips), emitting
    * integer-exact per-clip stats. The oracle recomputes each stat in
    * closed form from the synth parameters — any asymmetry in the
    * encode→decode→analyze cycle (header parse, endianness, sign
    * handling) breaks the hash. One scan, zero shuffles. [oracle]
    */
  def m5_audio_features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (sr, n, peak, cross) = wavStats(synthWav(id))
          (id, sr, n, peak, cross)
        }
      }
      .toDF("doc_id", "sample_rate", "n_frames", "peak", "zero_crossings")
      .orderBy("doc_id")
  }

  /** DuckDB mirror of m5: the synth parameters' closed forms — square
    * wave of half-period h over n frames crosses zero at every multiple
    * of h in [1, n-1], i.e. (n-1) // h times.
    */
  val m5_oracle: String =
    """SELECT doc_id,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(800 + (doc_id % 5) * 80 AS BIGINT) AS n_frames,
      |  CAST(1000 + (doc_id % 3) * 500 AS BIGINT) AS peak,
      |  CAST((800 + (doc_id % 5) * 80 - 1) // (8 + (doc_id % 7) * 4) AS BIGINT)
      |    AS zero_crossings
      |FROM documents ORDER BY doc_id""".stripMargin

  def m4_resize(spark: SparkSession, dir: String): DataFrame =
    resizeImages(mediaTable(spark, dir)).toDF()
      .select(col("doc_id"), col("src_w").cast("long").as("src_w"),
        col("src_h").cast("long").as("src_h"),
        col("dst_w").cast("long").as("dst_w"),
        col("dst_h").cast("long").as("dst_h"), col("out_bytes"))
      .orderBy("doc_id")

  /** DuckDB mirror of m4: metadata dims + the same fit arithmetic. */
  val m4_oracle: String =
    """WITH img AS (
      |  SELECT doc_id,
      |    CAST((doc_id % 64) * 16 + 16 AS BIGINT) AS src_w,
      |    CAST((doc_id % 48) * 16 + 16 AS BIGINT) AS src_h
      |  FROM documents WHERE doc_id % 3 = 0),
      |f AS (
      |  SELECT doc_id, src_w, src_h, GREATEST(src_w, src_h) AS m FROM img),
      |d AS (
      |  SELECT doc_id, src_w, src_h,
      |    CASE WHEN m <= 224 THEN src_w ELSE GREATEST(1, src_w * 224 // m) END AS dst_w,
      |    CASE WHEN m <= 224 THEN src_h ELSE GREATEST(1, src_h * 224 // m) END AS dst_h
      |  FROM f)
      |SELECT doc_id, src_w, src_h, dst_w, dst_h,
      |  dst_w * dst_h * 3 AS out_bytes
      |FROM d ORDER BY doc_id""".stripMargin

  /** m3_frame_sample — video frame sampling: for each video asset, emit a
    * uniform-stride subset of frame indices (~8 samples: stride =
    * max(1, n_frames/8)) with per-sample timestamps — the standard
    * pick-frames-then-decode front half of a video ingest pipeline. The
    * decode of each sampled frame is the same stubbed contract as m1;
    * everything before it is real: per-asset frame counts from metadata
    * (deterministic here; a real lake reads them from the container
    * header), sequence + posexplode fan-out (narrow — the binary payload
    * is NOT replicated per frame; the decoder later seeks into it), and
    * integer-exact timestamps (DIV, not double division, so engines
    * agree). One scan, zero shuffles. [oracle]
    */
  def m3_frame_sample(spark: SparkSession, dir: String): DataFrame = {
    val fps = 24
    mediaTable(spark, dir).toDF()
      .filter(col("modality") === "video")
      .withColumn("n_frames", (pmod(col("doc_id"), lit(240)) + lit(30)).cast("int"))
      .withColumn("stride", greatest(lit(1), expr("CAST(n_frames DIV 8 AS INT)")))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("stride").cast("long").as("stride"),
        explode(sequence(lit(0), col("n_frames") - 1, col("stride"))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"),
        expr("CAST(frame_idx DIV stride AS BIGINT)").as("sample_no"),
        col("frame_idx").cast("long").as("frame_idx"),
        expr(s"CAST(frame_idx * 1000L DIV $fps AS BIGINT)").as("ts_ms"))
      .orderBy("doc_id", "frame_idx")
  }

  /** DuckDB mirror of m3: same metadata formulas, range() fan-out,
    * integer division (`//`) for sample_no and timestamps.
    */
  val m3_oracle: String =
    """WITH vids AS (
      |  SELECT doc_id, CAST(doc_id % 240 + 30 AS BIGINT) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2),
      |s AS (
      |  SELECT doc_id, n_frames, GREATEST(1, n_frames // 8) AS stride
      |  FROM vids),
      |fr AS (
      |  SELECT doc_id, n_frames, stride,
      |    unnest(range(0, n_frames, stride)) AS frame_idx
      |  FROM s)
      |SELECT doc_id, n_frames,
      |  frame_idx // stride AS sample_no,
      |  frame_idx,
      |  frame_idx * 1000 // 24 AS ts_ms
      |FROM fr ORDER BY doc_id, frame_idx""".stripMargin

  /** DuckDB mirror of m2: payload bytes = octet_length(text) (the payload
    * IS the utf-8 encoding of the text), metadata formulas inlined.
    */
  val m2_oracle: String =
    """SELECT modality, COUNT(*) AS n_assets,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(SUM(CAST((doc_id % 64) * 16 + 16 AS BIGINT) * ((doc_id % 48) * 16 + 16)) AS BIGINT) AS total_pixels,
      |  CAST(MAX(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END) AS BIGINT) AS max_rate
      |FROM (SELECT doc_id, text,
      |        (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality
      |      FROM documents)
      |GROUP BY modality ORDER BY modality""".stripMargin

  /** m6_media_dedup — exact-payload deduplication of the media lake (the
    * d1 discipline applied to BINARY columns): group assets by
    * sha256(payload) per modality and report the storage story — asset
    * count, distinct payloads, duplicate assets, and the bytes a
    * content-addressed store reclaims ((copies−1)·bytes per group).
    * Byte-identical re-encodes are the dominant redundancy in scraped
    * media corpora, and this is the scan that sizes it. The payload is
    * hashed ONCE in the narrow scan and only the 32-byte digest enters
    * the shuffle — megabyte payloads never become shuffle keys. [oracle]
    */
  def m6_media_dedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(col("modality"), sha2(col("payload"), 256).as("ph"),
        length(col("payload")).cast("long").as("nb"))
      .groupBy("modality", "ph")
      .agg(count(lit(1)).as("copies"), first(col("nb")).as("nb"))
      .groupBy("modality")
      .agg(
        sum("copies").cast("long").as("n_assets"),
        count(lit(1)).as("n_unique_payloads"),
        sum(col("copies") - 1).cast("long").as("n_dup_assets"),
        sum((col("copies") - 1) * col("nb")).cast("long").as("bytes_reclaimable"))
      .orderBy("modality")

  /** DuckDB mirror of m6: the payload is the utf-8 text, so
    * sha256(text) groups exactly the same byte streams.
    */
  val m6_oracle: String =
    """WITH assets AS (
      |  SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |    sha256(text) AS ph, octet_length(encode(text)) AS nb
      |  FROM documents),
      |groups AS (
      |  SELECT modality, ph, COUNT(*) AS copies, MIN(nb) AS nb
      |  FROM assets GROUP BY modality, ph)
      |SELECT modality,
      |  CAST(SUM(copies) AS BIGINT) AS n_assets,
      |  COUNT(*) AS n_unique_payloads,
      |  CAST(SUM(copies - 1) AS BIGINT) AS n_dup_assets,
      |  CAST(SUM((copies - 1) * nb) AS BIGINT) AS bytes_reclaimable
      |FROM groups GROUP BY modality ORDER BY modality""".stripMargin

  /** Deterministic 8×8 grayscale PNG for m7's oracle: pixel i of doc
    * `id` is the closed-form integer value [[m7PixelValue]] computes.
    * 8×8 source → aHash's 8×8 resample is the IDENTITY (no
    * interpolation is ever sampled), and grayscale makes the Rec.601
    * permille luma exactly the pixel value (299+587+114 = 1000), so the
    * aHash of the DECODED image equals pure integer arithmetic an
    * independent SQL engine can recompute — the closed form that lets a
    * real decode→hash path be oracle-checked.
    */
  private[ops] def m7SynthPng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      val v = m7PixelValue(id, i).toInt
      img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Batched m7 fixture generator — byte-identical pixels to
    * [[m7SynthPng]] row for row (spec-pinned), restructured for the
    * per-TASK cost profile (guide §1.2 step 2: per-task work):
    *
    *  - ONE MessageDigest per partition instead of 64 `getInstance`
    *    calls per document;
    *  - the 60-bit sha prefix taken numerically from the digest bytes
    *    (15 hex digits of the first 8 bytes == big-endian long >>> 4)
    *    instead of formatting and re-parsing a hex string per pixel;
    *  - the 64 group-base values cached across the ≤4 consecutive docs
    *    of one group (variants only SWAP two positions of the shared
    *    base pattern), so sha runs once per (group, pixel), not once
    *    per (doc, pixel).
    *
    * The REAL m7 path — PNG decode → aHash → band join — is untouched;
    * this only makes the synthetic corpus cheap to mint.
    */
  private[ops] def m7SynthPngBatch(ids: Iterator[Long]): Iterator[(Long, Array[Byte])] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    var cachedGrp = Long.MinValue
    val base = new Array[Int](64)
    ids.map { id =>
      val grp = id / 4
      if (grp != cachedGrp) {
        var j = 0
        while (j < 64) {
          base(j) =
            if (j == 63) 0
            else {
              md.reset()
              val d = md.digest(s"${grp}_${j}".getBytes("UTF-8"))
              // 15-hex-digit prefix of the digest == unsigned big-endian
              // long of bytes 0..7 shifted right one nibble
              var acc = 0L
              var b = 0
              while (b < 8) { acc = (acc << 8) | (d(b) & 0xffL); b += 1 }
              ((acc >>> 4) % 251L).toInt
            }
          j += 1
        }
        cachedGrp = grp
      }
      val k = (id % 4).toInt
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var i = 0
      while (i < 64) {
        val j = if (k > 0 && i == 2 * k - 2) 2 * k - 1
                else if (k > 0 && i == 2 * k - 1) 2 * k - 2
                else i
        val v = base(j)
        img.setRGB(i % 8, i / 8, (v << 16) | (v << 8) | v)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      id -> bos.toByteArray
    }
  }

  /** Pixel i (row-major, 0..63) of doc `id`'s synthetic image. Docs come
    * in GROUPS of 4 (id div 4): the base pattern is sha256(group, i) —
    * avalanching, so band buckets stay uniform and cross-group pairs
    * never verify at any corpus size — and variant k = id mod 4 > 0 SWAPS
    * the two pixel values at positions 2k-2 / 2k-1. A swap preserves the
    * pixel sum, hence the aHash mean, so variants flip at most the two
    * swapped bits: every group is a cluster of near-duplicates (hamming
    * ≤ 4 pairwise) with bands 1–3 identical, while distinct groups
    * differ in ~32 bits. Pixel 63 is forced to 0 so bit 63 (the sign
    * bit) is never set and band arithmetic stays portable. All integer,
    * all in-range for 64-bit: the same closed form evaluates in SQL.
    */
  private[ops] def m7PixelValue(id: Long, i: Long): Long = {
    if (i == 63L) return 0L
    val grp = id / 4
    val k = id % 4
    val j = if (k > 0 && i == 2 * k - 2) 2 * k - 1
            else if (k > 0 && i == 2 * k - 1) 2 * k - 2
            else i
    // sha256 per (group, pixel) — the repo's standard cross-engine hash
    // seam (60-bit hex prefix → mod). True avalanche matters here:
    // every arithmetic formula tried (linear/quadratic mod-prime mixes)
    // left cross-group vector structure (progressions mod 251, square-
    // symmetry palindromes) that made distinct groups land within
    // hamming 10 and the pair count superlinear; with sha the output is
    // exactly 6 pairs per group — linear in the corpus at every SF.
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"${grp}_${j}".getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 251L
  }

  /** m7_phash_dedup — perceptual image dedup as an ORACLE entry: the
    * real decode→aHash→band-join path of [[imagePhashPairs]] runs over
    * deterministic synthetic PNGs whose decoded 8×8 luma grid is
    * closed-form ([[m7SynthPng]]), so DuckDB recomputes the identical
    * hashes from the formula and mirrors the band join + hamming
    * verify — the full perceptual-dedup pipeline, hash-checked without
    * the oracle ever decoding a pixel. Scale shape: one narrow map per
    * doc (encode+decode+hash, only the 8-byte hash leaves the task),
    * then d3's linear band-bucket join. [oracle]
    */
  def m7_phash_dedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The id list arrives as ONE scan task (documents.parquet is a single
    // small file at test SFs), which would serialize ~1 ms/doc of codec
    // work on one core while 31 idle — the guide §2.5 "input skew" case.
    // RANGE-partition the ids so each task owns a contiguous id span:
    // same 32× spread as a round-robin repartition, but group members
    // stay adjacent, so the per-partition group cache in the batch
    // generator keeps its 4× sha saving. The range key is the GROUP id
    // (doc_id DIV 4), not doc_id: range boundaries are sample-based and
    // a boundary on raw doc_id could split a 4-doc group across two
    // partitions, silently recomputing its pixel base on both sides —
    // equal range keys always co-locate, so keying on the group id makes
    // the cache invariant hold at every boundary. At lake scale the scan
    // already has thousands of splits and the exchange moves only 8-byte
    // ids — never payloads.
    val par = spark.sparkContext.defaultParallelism
    val media = Tables(spark, dir).documents.select(col("doc_id"))
      .repartitionByRange(par, expr("doc_id DIV 4"), col("doc_id"))
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        m7SynthPngBatch(ids).map { case (id, png) =>
          MediaRow(id, "image", png, 8, 8, 0)
        }
      }
    imagePhashPairs(media)
  }

  /** DuckDB mirror of m7: the same (group, variant-swap, pixel) integer
    * formula → per-doc mean → aHash bits, then imagePhashPairs' exact
    * band join ((h >> 16b) & 65535 buckets, doc_a < doc_b, DISTINCT,
    * bit_count(xor) ≤ 10).
    */
  val m7_oracle: String =
    """WITH px AS (
      |  SELECT doc_id, doc_id // 4 AS grp, doc_id % 4 AS k, i
      |  FROM (SELECT doc_id FROM documents),
      |    LATERAL (SELECT unnest(range(0, 64)) AS i)),
      |pv AS (
      |  SELECT doc_id, i,
      |    CASE WHEN i = 63 THEN 0
      |         ELSE ('0x' || substr(sha256(CAST(grp AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 15))::BIGINT % 251 END AS v
      |  FROM (SELECT doc_id, grp, k, i,
      |          CASE WHEN k > 0 AND i = 2*k - 2 THEN 2*k - 1
      |               WHEN k > 0 AND i = 2*k - 1 THEN 2*k - 2
      |               ELSE i END AS j
      |        FROM px)),
      |h AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN v > m THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS ahash
      |  FROM (SELECT doc_id, i, v,
      |          SUM(v) OVER (PARTITION BY doc_id) // 64 AS m FROM pv)
      |  GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, ahash, band, (ahash >> (band * 16)) & 65535 AS bkey
      |  FROM h, LATERAL (SELECT unnest([0, 1, 2, 3]) AS band)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.ahash AS ha, b.ahash AS hb
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 10
      |ORDER BY doc_a, doc_b""".stripMargin

  /** 64-bit average hash (aHash) of a decoded image — the classic
    * perceptual fingerprint: bilinear-scale to 8×8, integer luma per
    * cell (Rec.601 weights in integer permille), bit i set iff
    * luma_i > mean. Re-encodes, minor noise, and small edits move only
    * a few bits; distinct images differ in ~32.
    */
  private[ops] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val dst = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
    } finally g.dispose()
    val luma = new Array[Long](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val rgb = dst.getRGB(i % 8, i / 8)
      luma(i) = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
        (rgb & 0xff) * 114L) / 1000L
      sum += luma(i)
      i += 1
    }
    val mean = sum / 64
    var acc = 0L
    i = 0
    while (i < 64) {
      if (luma(i) > mean) acc |= (1L << i)
      i += 1
    }
    acc
  }

  /** Perceptual near-duplicate image pairs (the media-lake sibling of
    * d3's SimHash text dedup): every decodable image's aHash is
    * computed in the partition-wise batcher (decoder state per
    * partition, payloads never shuffled — only the 8-byte hash leaves
    * the scan), then d3's hamming-band discipline finds candidates —
    * 4×16-bit bands bucket-join (near hashes share a band with high
    * probability; identical re-encodes always do), exact
    * `bit_count(xor) ≤ maxHamming` verify. Linear in the lake size,
    * never all-pairs. Spec-green family (the aHash of a real decoded
    * pixel grid has no closed form an independent SQL oracle could
    * recompute — m6 covers the exact-payload case with a full oracle).
    */
  def imagePhashPairs(media: Dataset[MediaRow], maxHamming: Int = 10): DataFrame = {
    import media.sparkSession.implicits._
    val hashes = media.filter(_.modality == "image").mapPartitions { rows =>
      // hoist decode config once per partition: ImageIO's disk-backed
      // stream cache is the per-row overhead worth disabling here
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        scala.util.Try(Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload)))).toOption.flatten
          .map(img => (r.doc_id, aHash64(img)))
      }
    }.toDF("doc_id", "ahash")
    val banded = hashes.select(col("doc_id"), col("ahash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bkey", expr("(ahash >> (band * 16)) & 65535"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }
}
