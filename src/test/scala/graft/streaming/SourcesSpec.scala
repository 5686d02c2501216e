package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** S1 assembly plumbing: reader options, codec decode over a streaming
  * `value` column (the Kafka wire shape), and the connector-missing failure
  * mode (the jar is deploy-time; this build must fail loud, not misread). */
class SourcesSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  test("kafkaOptions carries the consumer contract") {
    val opts = Sources.kafkaOptions("broker:9092", "chunks",
      maxOffsetsPerTrigger = Some(5000L))
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "chunks")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("failOnDataLoss") == "true")
    assert(opts("maxOffsetsPerTrigger") == "5000")
    assert(!Sources.kafkaOptions("b", "t").contains("maxOffsetsPerTrigger"))
  }

  test("decodeBlocks roundtrips Avro wire bytes from a value-column stream") {
    val blocks = Seq(
      ImageBlock("img.dd.0", "h0", Array[Byte](1, 2, 3)),
      ImageBlock("img.dd.1", "h1", Array[Byte](4, 5)))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Array[Byte]]
    val decoded = Sources.decodeBlocks(input.toDF().toDF("value"))
    val query = decoded.writeStream.outputMode("append")
      .format("memory").queryName("kafka_decode").start()
    input.addData(blocks.map(ImageBlockCodec.encode))
    query.processAllAvailable()
    val out = spark.table("kafka_decode").as[ImageBlock].collect()
      .sortBy(_.filename)
    query.stop()
    assert(out.length == 2)
    assert(out.map(_.filename).toSeq == Seq("img.dd.0", "img.dd.1"))
    assert(out.map(_.localHash).toSeq == Seq("h0", "h1"))
    assert(out(0).data.toSeq == Seq[Byte](1, 2, 3) && out(1).data.toSeq == Seq[Byte](4, 5))
  }

  test("kafka() fails loud without the deploy-time connector jar") {
    val e = intercept[Exception] {
      Sources.kafka(spark, "broker:9092", "chunks").writeStream
        .format("memory").queryName("nope").start()
    }
    assert(Option(e.getMessage).exists(_.toLowerCase.contains("kafka")))
  }
}
