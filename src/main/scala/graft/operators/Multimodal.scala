package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Vectors

/** Multimodal column plumbing (north-star surface): image/audio/video as
  * opaque binary columns with typed metadata, processed in PARTITION-SIZED
  * BATCHES via `mapPartitions` — the Scala analog of a Pandas-UDF
  * `mapInPandas` stage: one iterator per partition, the decoder amortizes
  * its setup (model load, codec init) across the whole batch instead of
  * paying it per row.
  *
  * The decode itself goes through the [[MediaDecoders]] trait, with two
  * bundled implementations: [[JdkImageDecoders]] — a REAL image codec over
  * the JDK's ImageIO (PNG/JPEG decode, bilinear resize, pixel-statistic
  * features; no external dependency) — and [[StubDecoders]], a
  * clearly-marked deterministic test double that fakes width/height and
  * features from the payload's bytes. The declared queries q47/q48 run the
  * stub ON PURPOSE: their fixture payloads are text bytes (not images),
  * and the stub's byte arithmetic is what the DuckDB oracles can
  * reproduce in SQL; MultimodalSpec runs the SAME stages over real PNGs
  * with [[JdkImageDecoders]]. Audio/video (ffmpeg) and model-forward
  * features remain stubs. Everything around the trait is identical either
  * way: the binary schema, the typed Encoder boundary, the batch shape,
  * the shuffle-free plan, and (q47/q48) the downstream aggregation and ANN
  * consumers.
  *
  * q47/q48 declare the family in the driver contract: payloads are the
  * documents' text re-encoded as binary (the q30 fixture convention; the
  * text is pure ASCII at every sf, so byte k == character k and the DuckDB
  * oracles reproduce the stub arithmetic with `ascii(substring(...))`).
  */
object Multimodal {

  /** Decoder surface of the multimodal stages. Implementations must be
    * serializable (the object ships to executors once per partition — the
    * init-once-per-batch slot). */
  trait MediaDecoders extends Serializable {
    /** payload → (width, height) */
    def decode(payload: Array[Byte]): (Int, Int)
    /** payload → re-encoded payload at the target size */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    /** payload → embedding (the model forward pass) */
    def features(payload: Array[Byte]): Array[Float]
  }

  /** STUB decoders — deterministic test doubles for the real codecs. */
  object StubDecoders extends MediaDecoders {
    def decode(payload: Array[Byte]): (Int, Int) = decodeStub(payload)
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      resizeStub(payload, w, h)
    def features(payload: Array[Byte]): Array[Float] = featureStub(payload)
  }

  /** PRODUCTION decoders over the JDK's ImageIO (PNG/JPEG/GIF/BMP — no
    * external dependency, headless-safe): true pixel decode for
    * dimensions, a bilinear re-render for resize, and a 16-dim pixel
    * statistic vector for features. Swapping this object for
    * [[StubDecoders]] is the ONE-line production switch the trait exists
    * for; every mapPartitions stage, schema, and downstream consumer is
    * unchanged (q47/q48 keep the stub so their DuckDB oracles stay
    * reproducible over the text fixture — real image bytes have no SQL
    * twin). ImageIO readers are fetched per call from the static registry;
    * the per-partition batch shape still amortizes JVM/class init. */
  object JdkImageDecoders extends MediaDecoders {
    import java.awt.image.BufferedImage

    // ImageIO's default stream cache backs EVERY read/write with a temp
    // FILE (create + delete in java.io.tmpdir per image) — for KB-scale
    // payloads the filesystem churn dwarfs the codec, and 32 concurrent
    // tasks contend on one tmp directory. Memory-cached streams instead:
    // measured 493 → ~130 µs/doc single-thread on the q94 kernel
    // (synth + decode + resize + re-decode + features). JVM-static, set
    // at object init so every executor flips it before its first decode.
    javax.imageio.ImageIO.setUseCache(false)

    private def read(payload: Array[Byte]): BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      img
    }

    def decode(payload: Array[Byte]): (Int, Int) = {
      val i = read(payload)
      (i.getWidth, i.getHeight)
    }

    /** Bilinear scale, re-encoded as PNG (lossless: resize twice is
      * deterministic, and the output feeds [[decode]]/[[features]]). */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      require(w > 0 && h > 0, s"target ${w}x$h")
      val src = read(payload)
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    }

    /** 16-dim image statistics standing where a model embedding would:
      * [mean R, G, B; stddev R, G, B; 10-bin luminance histogram,
      * L1-normalized]. Accumulated in double, rounded to float ONCE (the
      * q48 single-rounding contract), so the vector is deterministic and
      * plugs into every `array<float>` ANN/near-dup consumer. */
    def features(payload: Array[Byte]): Array[Float] = {
      val img = read(payload)
      val (w, h) = (img.getWidth, img.getHeight)
      val n = w.toLong * h
      val sum = new Array[Double](3)
      val sumSq = new Array[Double](3)
      val hist = new Array[Long](10)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff; val b = rgb & 0xff
          sum(0) += r; sum(1) += gg; sum(2) += b
          sumSq(0) += r.toDouble * r; sumSq(1) += gg.toDouble * gg; sumSq(2) += b.toDouble * b
          // ITU-R BT.601 luma, binned 0..9
          val luma = 0.299 * r + 0.587 * gg + 0.114 * b
          hist(math.min(9, (luma / 25.6).toInt)) += 1
          x += 1
        }
        y += 1
      }
      val out = new Array[Float](16)
      var c = 0
      while (c < 3) {
        val mean = sum(c) / n
        out(c) = mean.toFloat
        out(3 + c) = math.sqrt(math.max(0.0, sumSq(c) / n - mean * mean)).toFloat
        c += 1
      }
      var b = 0
      while (b < 10) { out(6 + b) = (hist(b).toDouble / n).toFloat; b += 1 }
      out
    }
  }

  /** Typed record for decoded media metadata. */
  final case class MediaMeta(docId: Long, nBytes: Long, width: Int, height: Int)

  /** STUB decoder — stands in for a real `ImageIO.read`/ffmpeg call.
    * Deterministic: dimensions derive from payload content so tests can
    * assert exact values. */
  def decodeStub(payload: Array[Byte]): (Int, Int) = {
    val a = if (payload.length > 0) payload(0) & 0xff else 0
    val b = if (payload.length > 1) payload(1) & 0xff else 0
    (256 + (a * 7 + b) % 1024, 256 + (b * 7 + a) % 768)
  }

  /** Batch decode: (doc_id, payload binary) rows → typed [[MediaMeta]].
    * The per-partition setup slot (where a real decoder would init) runs
    * once per batch, then streams the iterator — no materialization. */
  def extractMeta(rows: DataFrame,
      dec: MediaDecoders = StubDecoders): Dataset[MediaMeta] = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-batch decoder init happens HERE (once per partition)
        it.map { case (id, payload) =>
          val (w, h) = dec.decode(payload)
          MediaMeta(id, payload.length.toLong, w, h)
        }
      }
  }

  /** Tolerant batch decode — the 100 TB posture: ONE corrupt blob in a
    * billion must quarantine, not kill the stage. Corrupt payloads
    * surface as (null dims, error message) rows instead of a thrown
    * task failure; every input row appears exactly once (conservation),
    * and the quarantine volume is OBSERVED per execution
    * (`graft_media_quarantine`: quarantined count + total — the q20/q70
    * not-silent doctrine), so a decoder regression or a poisoned source
    * is visible in metrics before anyone greps logs. [[extractMeta]]
    * stays the strict twin (fail loudly) for pipelines that PREFER a
    * crash over silent data loss. */
  def extractMetaTolerant(rows: DataFrame,
      dec: MediaDecoders = StubDecoders): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          try {
            val (w, h) = dec.decode(payload)
            (id, payload.length.toLong, Option(w), Option(h), None: Option[String])
          } catch {
            case scala.util.control.NonFatal(e) =>
              (id, payload.length.toLong, None: Option[Int], None: Option[Int],
                Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)))
          }
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "error")
      .observe("graft_media_quarantine",
        count(when(col("error").isNotNull, lit(1))).as("quarantined"),
        count(lit(1)).as("total"))
  }

  /** Decoded-and-resized media row: payload re-encoded at target size. */
  final case class ResizedMedia(docId: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** STUB resize kernel — stands in for a real scaler. Deterministic:
    * output bytes sample the input at a fixed stride so the payload
    * genuinely shrinks with the target size. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (payload.isEmpty) return payload // zero-byte blob: nothing to sample
    val outLen = math.max(1, math.min(payload.length, w * h / 64))
    val stride = math.max(1, payload.length / outLen)
    Array.tabulate(outLen)(i => payload(math.min(i * stride, payload.length - 1)))
  }

  /** Batch resize: the transform-shaped multimodal stage (binary in →
    * binary out, same row count). Like [[extractMeta]], a per-partition
    * batch so a real scaler inits once per batch. */
  def resize(rows: DataFrame, w: Int, h: Int,
      dec: MediaDecoders = StubDecoders): Dataset[ResizedMedia] = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, payload) =>
        ResizedMedia(id, w, h, dec.resize(payload, w, h))
      })
  }

  /** One sampled frame of a (fake) video payload. */
  final case class Frame(docId: Long, frameNo: Int, tsMs: Long,
      payload: Array[Byte])

  /** Batch frame sampling: the GENERATOR-shaped multimodal stage — one
    * binary video row explodes into every Nth frame. The stub treats the
    * payload as fixed-size frame slices; a real build swaps the slicer for
    * a demuxer, the `flatMap`/iterator plumbing is the operator. Row
    * explosion happens streamingly (Iterator, never a per-row buffer), so
    * a long video never materializes all frames in executor memory. */
  def sampleFrames(rows: DataFrame, frameBytes: Int,
      everyNth: Int, fps: Double = 30.0): Dataset[Frame] = {
    import rows.sparkSession.implicits._
    require(frameBytes > 0 && everyNth > 0)
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, payload) =>
        val nFrames = payload.length / frameBytes
        Iterator.range(0, nFrames, everyNth).map { f =>
          Frame(id, f, (f * 1000L / fps).toLong,
            java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
        }
      })
  }

  /** STUB feature extractor — stands in for an embedding model forward
    * pass: a 16-bin byte histogram, L1-normalized. Deterministic, and the
    * output column type (`array<float>`) matches the `embeddings` table, so
    * downstream ANN/near-dup (q21/q28/q40/q46/q48) consume it unchanged.
    * The normalization divides in DOUBLE and rounds to FLOAT once — the
    * single-rounding contract the oracle reproduces with
    * `CAST(c::DOUBLE / n::DOUBLE AS REAL)` (a float÷float here would pit
    * engine-specific float arithmetic against double-then-round). */
  def featureStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    payload.foreach(b => hist((b & 0xff) / 16) += 1.0f)
    val n = math.max(1, payload.length)
    hist.map(h => (h.toDouble / n.toDouble).toFloat)
  }

  /** Batch feature extraction: binary → embedding vector. The per-batch
    * init slot is where a real model loads ONCE per partition (the whole
    * point of the mapInPandas/mapPartitions batch shape — never per row). */
  def extractFeatures(rows: DataFrame,
      dec: MediaDecoders = StubDecoders): DataFrame = {
    import rows.sparkSession.implicits._
    rows.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // model load happens HERE (once per partition)
        it.map { case (id, payload) => (id, dec.features(payload)) }
      }
      .toDF("doc_id", "embedding")
  }

  /** The binary fixture both declared queries read: documents' text cast
    * to an opaque payload (q30 convention). */
  private def binaryDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  // ---------------------------------------------------------------- q47

  /** Multimodal metadata aggregation: the batch-decode stage
    * ([[extractMeta]] — a REAL mapPartitions over binary payloads, stub
    * kernel inside) followed by a metadata rollup per width bucket. The
    * plan is scan → deserialize → mapPartitions → partial agg → exchange
    * on the tiny bucket key — the decode never shuffles. */
  def q47MultimodalMeta(s: SparkSession, d: String): DataFrame =
    extractMeta(binaryDocs(s, d)).toDF()
      .groupBy(expr("CAST(width DIV 128 AS INT)").as("wbucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nBytes")).as("total_bytes"),
        min(col("height")).as("min_h"),
        max(col("height")).as("max_h"))
      .orderBy(col("wbucket"))

  def q47Sql: String =
    """WITH b AS (
      |  SELECT doc_id, len(text) AS n,
      |    CASE WHEN len(text) >= 1 THEN ascii(substring(text, 1, 1)) ELSE 0 END AS ba,
      |    CASE WHEN len(text) >= 2 THEN ascii(substring(text, 2, 1)) ELSE 0 END AS bb
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, n AS n_bytes,
      |    256 + (ba * 7 + bb) % 1024 AS width,
      |    256 + (bb * 7 + ba) % 768 AS height
      |  FROM b
      |)
      |SELECT CAST(width // 128 AS INT) AS wbucket, count(*) AS n_docs,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  CAST(min(height) AS INT) AS min_h, CAST(max(height) AS INT) AS max_h
      |FROM m GROUP BY 1 ORDER BY wbucket""".stripMargin

  // ---------------------------------------------------------------- q48

  /** Feature-extract → ANN: [[extractFeatures]] (the model-forward-shaped
    * mapPartitions stage) feeding the q21 brute-force cosine top-k skeleton
    * unchanged — the promise of the `array<float>` output type made good in
    * a declared query. Probes = doc_id < 10, top-3 (doc_id tiebreak; the
    * 16-bin histograms tie often, the tiebreak keeps both engines exact). */
  def q48FeatureAnn(s: SparkSession, d: String): DataFrame = {
    val emb = extractFeatures(binaryDocs(s, d))
      .select(col("doc_id"), col("embedding"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
    val probes = emb.filter(col("doc_id") < 10)
      .select(col("doc_id").as("probe_id"), col("embedding").as("pe"),
        col("n2").as("pn2"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("doc_id"))
    emb.crossJoin(broadcast(probes))
      .filter(col("doc_id") =!= col("probe_id"))
      .withColumn("cosine",
        Vectors.dot(col("pe"), col("embedding")) / sqrt(col("pn2") * col("n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("probe_id"), col("doc_id"), col("cosine"), col("rn"))
      .orderBy(col("probe_id"), col("rn"))
  }

  def q48Sql: String = {
    val dot = Similarity.duckDotSql _
    s"""WITH b AS (
       |  SELECT doc_id, text, len(text) AS n FROM documents
       |), bytes AS (
       |  SELECT doc_id, text, n, unnest(range(1, n + 1)) AS i FROM b
       |), cnt AS (
       |  SELECT doc_id, ascii(substring(text, CAST(i AS INT), 1)) // 16 AS bin,
       |    count(*) AS c
       |  FROM bytes GROUP BY 1, 2
       |), bins AS (
       |  SELECT doc_id, n, unnest(range(0, 16)) AS bin FROM b
       |), hist AS (
       |  SELECT doc_id, bin,
       |    CAST(CAST(coalesce(c, 0) AS DOUBLE)
       |      / CAST(CASE WHEN n < 1 THEN 1 ELSE n END AS DOUBLE) AS REAL) AS hv
       |  FROM bins LEFT JOIN cnt USING (doc_id, bin)
       |), emb AS (
       |  SELECT doc_id, embedding, ${dot("embedding", "embedding")} AS n2 FROM (
       |    SELECT doc_id, list(hv ORDER BY bin) AS embedding FROM hist GROUP BY doc_id) t
       |), probes AS (
       |  SELECT doc_id AS probe_id, embedding AS pe, n2 AS pn2 FROM emb WHERE doc_id < 10
       |), scored AS (
       |  SELECT probe_id, e.doc_id,
       |    ${dot("pe", "e.embedding")} / sqrt(pn2 * e.n2) AS cosine
       |  FROM emb e, probes WHERE e.doc_id <> probe_id
       |), ranked AS (
       |  SELECT probe_id, doc_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, doc_id) AS INT) AS rn
       |  FROM scored
       |)
       |SELECT probe_id, doc_id, cosine, rn FROM ranked
       |WHERE rn <= 3 ORDER BY probe_id, rn""".stripMargin
  }
}
