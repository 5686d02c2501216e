package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-source assembly (S1). The reference consumes a Kafka topic of
  * Avro-encoded image chunks (`StreamingApp.scala:309-312` —
  * `KafkaUtils.createDirectStream` + the Avro decode); here the same
  * assembly is a Structured Streaming `format("kafka")` read piped through
  * the S2 codec.
  *
  * The Kafka connector jar is a deploy-time dependency
  * (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`); this
  * build adds no libraryDependencies, so [[kafka]] resolves the format when
  * the source loads. Everything AFTER the source — [[decodeBlocks]], the
  * whole [[ChunkIngest]] machine — is source-agnostic and exercised by the
  * file/memory source suites carrying the same wire bytes.
  */
object Sources {

  /** Reader options, factored out so the plumbing is unit-testable without
    * a broker. `failOnDataLoss` stays true: a truncated topic silently
    * skipping chunks would read as a permanent HW gap downstream. */
  def kafkaOptions(bootstrap: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "true"
    ) ++ maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** S2/P2: `value` bytes → typed [[ImageBlock]] rows. Works on any frame
    * with a binary `value` column — kafka, file, or memory stream. Null
    * values (compacted-topic tombstones, delete markers) are dropped —
    * decoding one would NPE and wedge the query on every restart. */
  def decodeBlocks(raw: DataFrame): Dataset[ImageBlock] = {
    import raw.sparkSession.implicits._
    raw.select(col("value").cast("binary"))
      .filter(col("value").isNotNull)
      .as[Array[Byte]]
      .map(ImageBlockCodec.decode)
  }

  /** S1 literal: the reference's Kafka consumer as a Structured Streaming
    * source, decoded to the typed chunk stream [[ChunkIngest.start]] takes. */
  def kafka(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): Dataset[ImageBlock] =
    decodeBlocks(spark.readStream.format("kafka")
      .options(kafkaOptions(bootstrap, topic, startingOffsets, maxOffsetsPerTrigger))
      .load())
}
