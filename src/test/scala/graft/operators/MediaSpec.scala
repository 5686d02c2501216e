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

  test("q90 duration rounding: integer oracle formula == Math.round over the whole space") {
    // the DuckDB oracle computes (2000f + sr) // (2sr); the probe computes
    // Math.round(f·1000 / sr). Pinned mismatch-free over every geometry
    // q90Params can emit (frames ≤ 2000, all five rates).
    for (sr <- Seq(8000, 11025, 16000, 22050, 44100); f <- 0L to 2200L) {
      val jvm = math.round(f * 1000.0 / sr.toFloat.toDouble)
      val exact = (2000 * f + sr) / (2L * sr)
      assert(jvm == exact, s"sr=$sr frames=$f: round=$jvm oracle=$exact")
    }
  }

  test("q90 == closed-form rollup, and the probed WAVs are real JDK containers") {
    val sf = graft.TestSession.sf
    // driver-side twin: the same closed-form parameters and integer
    // duration the oracle SQL computes, rolled up sequentially
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect()
    val expected = ids.map { id =>
      val (sr, ch, frames) = Media.q90Params(id)
      ((sr, ch), (frames.toLong, (2000L * frames + sr) / (2L * sr)))
    }.groupBy(_._1).map { case ((sr, ch), rows) =>
      val ds = rows.map(_._2)
      (sr, ch, 16, rows.length.toLong, ds.map(_._1).sum,
        ds.map(_._2).sum, ds.map(_._2).min, ds.map(_._2).max)
    }.toSeq.sorted
    val got = Media.q90AudioProbe(spark, sf).collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).sorted
    assert(got == expected)
    // and the fixture payload really is a RIFF/WAVE container the codec
    // round-trips: synth → probe is exact on a spot geometry
    val wav = Media.synthWav(11025, 2, 1234)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val (sr, ch, bits, frames, durMs) = Media.JdkAudioDecoders.probe(wav)
    assert((sr, ch, bits, frames, durMs) == ((11025, 2, 16, 1234L, 112L)))
  }

  test("q91 duration rounding: integer oracle formula == Math.round over the whole space") {
    // oracle computes (nf·us + 500) // 1000; MjpegAvi.probe computes
    // Math.round(nf·us / 1000.0). Every geometry q91Params can emit.
    for (us <- Seq(33367L, 40000L, 100000L); nf <- 0L to 16L) {
      val jvm = math.round(nf * us / 1000.0)
      val exact = (nf * us + 500) / 1000
      assert(jvm == exact, s"us=$us nf=$nf: round=$jvm oracle=$exact")
    }
  }

  test("q91 == closed-form rollup, through REAL container parse + REAL JPEG decode") {
    val sf = graft.TestSession.sf
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect()
    val expected = ids.map { id =>
      val (w, h, nf, us) = Media.q91Params(id)
      ((w, h), (nf.toLong, (nf * us + 500) / 1000))
    }.groupBy(_._1).map { case ((w, h), rows) =>
      val ds = rows.map(_._2)
      (w, h, rows.length.toLong, ds.map(_._1).sum,
        ds.map(_._2).sum, ds.map(_._2).min, ds.map(_._2).max)
    }.toSeq.sorted
    val got = Media.q91VideoProbe(spark, sf).collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sorted
    assert(got == expected)
    // n_frames_decoded counts only frames ImageIO ACTUALLY decoded at the
    // container dims — equality with the closed-form frame total means
    // every synthesized JPEG round-tripped through the real codec.
    assert(got.map(_._4).sum == ids.map(id => Media.q91Params(id)._3.toLong).sum)
  }

  test("q94 kernels: decode/resize/features are exact on solid PNGs over the whole space") {
    // every geometry q94Params can emit × colors spanning the RGB cube
    // (extremes + the hash spread): the REAL codec chain must reproduce
    // the closed-form statistics the DuckDB oracle computes — dims from
    // the container, channel means == the color's channels, stddev == 0,
    // a single 1.0 histogram spike at the BT.601 luma bin.
    val colors = Seq(0x000000, 0xffffff, 0x0000ff, 0xff0000) ++
      (0L until 8L).map(id => Media.q94Params(id)._3)
    for (w <- Seq(20, 28, 36, 44); h <- Seq(16, 24, 32); rgb <- colors) {
      val png = Media.synthPng(w, h, rgb)
      assert(Multimodal.JdkImageDecoders.decode(png) == (w, h))
      val resized = Multimodal.JdkImageDecoders.resize(png, 12, 10)
      assert(Multimodal.JdkImageDecoders.decode(resized) == (12, 10))
      val f = Multimodal.JdkImageDecoders.features(resized)
      val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      assert((f(0), f(1), f(2)) == (r.toFloat, g.toFloat, b.toFloat),
        s"color $rgb: means ${f.take(3).toSeq}")
      assert(f(3) == 0f && f(4) == 0f && f(5) == 0f,
        s"color $rgb: solid image has nonzero stddev ${f.slice(3, 6).toSeq}")
      val bin = math.min(9, ((0.299 * r + 0.587 * g + 0.114 * b) / 25.6).toInt)
      val hist = f.slice(6, 16)
      assert(hist(bin) == 1.0f && hist.sum == 1.0f,
        s"color $rgb: hist ${hist.toSeq} expected spike at $bin")
    }
  }

  test("q94 == closed-form rollup through the real encode/decode/resize/features chain") {
    val sf = graft.TestSession.sf
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.groupBy { id =>
      val (w, h, _) = Media.q94Params(id); (w, h)
    }.map { case ((w, h), g) =>
      val rgbs = g.map(id => Media.q94Params(id)._3)
      val sumRgb = rgbs.map(c =>
        ((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)).map(_.toLong).sum
      val sumPeak = rgbs.map { c =>
        val (r, gg, b) = ((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)
        math.min(9, ((0.299 * r + 0.587 * gg + 0.114 * b) / 25.6).toInt).toLong
      }.sum
      (w, h) -> (g.length.toLong, sumRgb, sumPeak)
    }
    val got = Media.q94ImageProbe(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { row =>
      val (n, sumRgb, sumPeak) = expected((row.getInt(0), row.getInt(1)))
      assert(row.getLong(2) == n && row.getLong(3) == n, // all resized ok
        s"row $row expected n=$n")
      assert(row.getLong(4) == sumRgb && row.getLong(5) == sumPeak, s"row $row")
      assert(row.getDouble(6) == 0.0 && row.getDouble(7) == n.toDouble,
        s"row $row: stddev/mass")
    }
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

  /** A real w×h JPEG with a solid color — ImageIO encodes it, so the AVI
    * fixture's frames are genuine JPEG streams, not byte stubs. */
  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("MJPEG/AVI pure-JVM decode: real container parse + real JPEG frames in CI") {
    // 20 frames at 10 fps (usPerFrame = 100_000) → 2 s, 64×48
    val frames = (0 until 20).map(i => jpegFrame(64, 48, 0x102030 + i * 7))
    val avi = Media.MjpegAvi.encode(frames, 100000L, 64, 48)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    val (durMs, w, h) = Media.MjpegAvi.probe(avi)
    assert((durMs, w, h) == ((2000L, 64, 48)))
    // sample every 500 ms → every 5th frame: 0, 5, 10, 15
    val sampled = Media.MjpegAvi.sampleFrames(avi, 500L).toSeq
    assert(sampled.map(f => (f._1, f._2)) ==
      Seq((0, 0L), (5, 500L), (10, 1000L), (15, 1500L)))
    // the emitted bytes are REAL JPEGs: the JDK image codec decodes them
    sampled.foreach { case (_, _, bytes) =>
      assert(Multimodal.JdkImageDecoders.decode(bytes) == ((64, 48)))
    }
    // frame bytes survive the container byte-exactly
    assert(sampled.head._3.toSeq == frames(0).toSeq)
    assert(sampled(1)._3.toSeq == frames(5).toSeq)
  }

  test("MJPEG/AVI behind the batch stages: probe + frame explode, distributed") {
    val avi1 = Media.MjpegAvi.encode(
      (0 until 6).map(i => jpegFrame(32, 24, 0x406080 + i)), 200000L, 32, 24)
    val avi2 = Media.MjpegAvi.encode(
      (0 until 3).map(i => jpegFrame(16, 16, 0x91a1b1 + i)), 100000L, 16, 16)
    val df = Seq((1L, avi1), (2L, avi2)).toDF("doc_id", "payload")
    val meta = Media.extractVideoMeta(df, Media.MjpegAvi)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(meta == Set((1L, 1200L, 32, 24), (2L, 300L, 16, 16)))
    // frames through sampleVideoFrames feed the image feature stage — the
    // full video→frame→feature pipeline with zero stubs
    val fr = Media.sampleVideoFrames(df, 200L, Media.MjpegAvi)
    val feats = Multimodal.extractFeatures(
      fr.select(col("docId").as("doc_id"), col("payload")),
      Multimodal.JdkImageDecoders).collect()
    assert(fr.count() == 6L + 2L) // every 1st of 6; every 2nd of 3
    assert(feats.forall(_.getAs[Seq[Float]](1).size == 16))
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

  test("q100 == q94 from the STORED payload column; plan scans parquet binary, no synth") {
    val sf = graft.TestSession.sf
    // identical answer: the stored payloads ARE q94's containers
    assert(Media.q100StoredMediaProbe(spark, sf).collect().map(_.toSeq).toSeq ==
      Media.q94ImageProbe(spark, sf).collect().map(_.toSeq).toSeq)
    // the declared plan reads the payload column from parquet storage —
    // the production IO shape (q94's plan, by contrast, scans doc_id only
    // and synthesizes in the task)
    val plan = Media.q100StoredMediaProbe(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("payload"), "q100 plan must read the payload column")
    assert(plan.toLowerCase.contains("parquet"),
      "q100 payloads must come from a parquet scan")
    val fixturePath = Media.mediaFixturePath(sf)
    assert(plan.contains(new java.io.File(fixturePath).getName),
      "q100 must scan the media fixture table")
    // and the fixture on disk really carries binary payloads
    val stored = spark.read.parquet(fixturePath)
    assert(stored.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(stored.count() == graft.Tables.documents(spark, sf).count())
  }
}
