package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
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
  object JdkAudioDecoders extends Serializable {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

    private def open(payload: Array[Byte]): AudioInputStream =
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))

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
        val in = AudioSystem.getAudioInputStream(target, raw)
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
      * so their scratch files can be unlinked eagerly. */
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
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.getErrorStream.readAllBytes()
      val rc = p.waitFor()
      require(rc == 0, s"${cmd.head} exited $rc")
      out
    }

    def probe(payload: Array[Byte]): (Long, Int, Int) = withPayload(payload) { in =>
      val out = run(ffprobe, "-v", "error",
        "-select_streams", "v:0",
        "-show_entries", "stream=width,height:format=duration",
        "-of", "csv=p=0", in.toString)
      // two csv lines: "w,h" then "durationSec"
      val lines = out.trim.split("\n").map(_.trim).filter(_.nonEmpty)
      val Array(w, h) = lines(0).split(",").take(2).map(_.trim.toInt)
      val durMs = math.round(lines.last.toDouble * 1000.0)
      (durMs, w, h)
    }

    def sampleFrames(payload: Array[Byte], everyMs: Long): Iterator[(Int, Long, Array[Byte])] =
      withPayload(payload) { in =>
        val dir = java.nio.file.Files.createTempDirectory(scratch.get(), "frames-")
        try {
          run(ffmpeg, "-v", "error", "-i", in.toString,
            "-vf", s"fps=1000/$everyMs", "-start_number", "0",
            s"$dir/f-%06d.png")
          val files = java.nio.file.Files.list(dir).toArray
            .map(_.asInstanceOf[java.nio.file.Path])
            .sortBy(_.getFileName.toString)
          // materialize THIS payload's sampled frames (bounded by the
          // sampling rate, not the video length), then unlink eagerly
          files.iterator.zipWithIndex.map { case (p, i) =>
            val bytes = java.nio.file.Files.readAllBytes(p)
            java.nio.file.Files.deleteIfExists(p)
            (i, i * everyMs, bytes)
          }.toArray.iterator
        } finally {
          java.nio.file.Files.list(dir).forEach(p =>
            java.nio.file.Files.deleteIfExists(p))
          java.nio.file.Files.deleteIfExists(dir)
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
