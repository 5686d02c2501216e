package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** The audio/video modalities' decode contract:
  *
  *  - Audio is REAL: a synthesized WAV (no fixture file needed — the JDK
  *    writes and reads its own container) probes to its exact format and
  *    the 16-dim feature vector matches closed-form signal math (a sine's
  *    RMS is amp/√2; its zero-crossing rate is 2f/sr).
  *  - Video: the ffmpeg CLI path asserts its real contract when the
  *    binary exists and DOCUMENTS THE SKIP when it doesn't (this
  *    container has no ffmpeg — `available` is the graceful-absence
  *    guard the decoder ships with); the stub slicer behind the trait is
  *    pinned drop-in identical to the original Multimodal.sampleFrames.
  */
class MediaSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  /** PCM16 little-endian sine WAV, `channels` identical (or opposed)
    * copies of amp·sin(2πf·t). */
  private def sineWav(freq: Double, sr: Int, ms: Int, amp: Double = 0.5,
      channels: Int = 1, opposePhase: Boolean = false): Array[Byte] = {
    val n = sr * ms / 1000
    val bytes = new Array[Byte](n * 2 * channels)
    var i = 0
    while (i < n) {
      val v = (amp * math.sin(2 * math.Pi * freq * i / sr) * 32767).toInt.toShort
      var c = 0
      while (c < channels) {
        val s = if (opposePhase && c % 2 == 1) (-v).toShort else v
        val o = (i * channels + c) * 2
        bytes(o) = (s & 0xff).toByte
        bytes(o + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(sr.toFloat, 16, channels, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(bytes), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio probe reads the real WAV header through the batch stage") {
    val wav = sineWav(440.0, 8000, 500)
    val df = Seq((1L, wav)).toDF("doc_id", "payload")
    val m = Media.extractAudioMeta(df).collect().head
    assert(m == Media.AudioMeta(1L, 8000, 1, 16, 4000L, 500L))
  }

  test("audio features match closed-form sine statistics") {
    val wav = sineWav(440.0, 8000, 500, amp = 0.5)
    val df = Seq((7L, wav)).toDF("doc_id", "payload")
    val row = Media.extractAudioFeatures(df).collect().head
    assert(row.getLong(0) == 7L)
    val f = row.getSeq[Float](1)
    assert(f.size == 16)
    val rmsExpected = 0.5 / math.sqrt(2.0) // sine RMS = amp/√2
    val zcrExpected = 2.0 * 440.0 / 8000.0 // two crossings per period
    (0 until 8).foreach { seg =>
      assert(math.abs(f(seg) - rmsExpected) < 0.01,
        s"segment $seg RMS ${f(seg)} != $rmsExpected")
      assert(math.abs(f(8 + seg) - zcrExpected) < 0.01,
        s"segment $seg ZCR ${f(8 + seg)} != $zcrExpected")
    }
  }

  test("tolerant audio probe quarantines non-audio payloads, conserves rows") {
    val mixed = Seq(
      (1L, sineWav(440.0, 8000, 100)),
      (2L, "not audio at all".getBytes("UTF-8")),
      (3L, Array.emptyByteArray))
      .toDF("doc_id", "payload")
    val out = Media.extractAudioMetaTolerant(mixed)
    val rows = out.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getInt(1)),
      if (r.isNullAt(6)) None else Some(r.getString(6)))).sortBy(_._1)
    assert(rows.length == 3, "row conservation violated")
    assert(rows(0)._2.contains(8000) && rows(0)._3.isEmpty)
    assert(rows(1)._2.isEmpty && rows(1)._3.nonEmpty)
    assert(rows(2)._2.isEmpty && rows(2)._3.nonEmpty)
    val m = out.queryExecution.observedMetrics("graft_audio_quarantine")
    assert(m.getAs[Long]("quarantined") == 2L && m.getAs[Long]("total") == 3L)
  }

  test("stereo decode mixes channels before statistics") {
    // opposite-phase stereo mixes to silence: every statistic is zero —
    // pins that the decode truly averages channels, not just takes one
    val wav = sineWav(440.0, 8000, 250, channels = 2, opposePhase = true)
    val f = Media.JdkAudioDecoders.features(wav)
    assert(f.forall(v => math.abs(v) < 1e-4), s"silence expected: ${f.toSeq}")
  }

  test("stub video decoder behind the trait == original sampleFrames kernel") {
    val payload = Array.tabulate[Byte](1024)(i => (i % 251).toByte)
    val df = Seq((3L, payload)).toDF("doc_id", "payload")
    val frameBytes = 64
    // everyMs = 67 at 30 fps → everyNth = round(2.01) = 2
    val viaTrait = Media.sampleVideoFrames(df, 67L,
      Media.StubVideoDecoders(frameBytes)).collect().toSeq
    val original = Multimodal.sampleFrames(df, frameBytes, everyNth = 2)
      .collect().toSeq
    assert(viaTrait.map(f => (f.docId, f.frameNo, f.tsMs, f.payload.toSeq)) ==
      original.map(f => (f.docId, f.frameNo, f.tsMs, f.payload.toSeq)))
    assert(viaTrait.nonEmpty)
  }

  test("ffmpeg video decode: real contract when present, documented skip when absent") {
    val dec = new Media.FfmpegVideoDecoders()
    assume(dec.available,
      "ffmpeg/ffprobe not on PATH in this environment — the decoder's " +
        "`available` guard is the documented graceful-absence contract; " +
        "deployments without the binary run StubVideoDecoders")
    // reached only where ffmpeg exists: synthesize a 2 s test pattern and
    // assert probe + sampled frames end-to-end into the image decoder
    val tmp = java.nio.file.Files.createTempFile("graft-testsrc-", ".mp4")
    val p = new ProcessBuilder("ffmpeg", "-y", "-v", "error",
      "-f", "lavfi", "-i", "testsrc=duration=2:size=64x48:rate=10",
      tmp.toString).start()
    assert(p.waitFor() == 0)
    val payload = java.nio.file.Files.readAllBytes(tmp)
    java.nio.file.Files.deleteIfExists(tmp)
    val (durMs, w, h) = dec.probe(payload)
    assert(w == 64 && h == 48 && math.abs(durMs - 2000L) <= 100)
    val frames = dec.sampleFrames(payload, 500L).toSeq
    assert(frames.size >= 3)
    // the sampled PNGs are REAL images: the JDK image decoder reads them
    val (fw, fh) = Multimodal.JdkImageDecoders.decode(frames.head._3)
    assert(fw == 64 && fh == 48)
  }
}
