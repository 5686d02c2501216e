package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** The stream record: one disk-image chunk (SURVEY.md §1.1, §2.1 S2).
  *
  * Mirrors the reference's 3-field Avro record — `filename`, `local_hash`,
  * `data` (reference: `AvroUtil.scala:26-34`, field positions read at
  * `StreamingApp.scala:84`). `filename` carries the chunk sequence number as
  * a trailing `.N` suffix (reference: `StreamingDiskUtil.scala:31,38`).
  */
final case class ImageBlock(filename: String, localHash: String, data: Array[Byte])

/** Avro binary codec for [[ImageBlock]] (operator S2/P2).
  *
  * The spark-avro connector (`from_avro`) is not on the classpath, so the
  * decode is a typed-Dataset map over the raw bytes using avro-core — the
  * same library function surface the reference uses, but implemented fresh
  * against a schema we declare ourselves. Encode exists so tests can
  * synthesize wire-format payloads without touching the reference.
  */
object ImageBlockCodec extends Serializable {

  /** Declared schema — fixed, no inference (SURVEY.md §1.2). */
  val SchemaJson: String =
    """{"type":"record","name":"ImageBlock","fields":[
      |{"name":"filename","type":"string"},
      |{"name":"local_hash","type":"string"},
      |{"name":"data","type":"bytes"}]}""".stripMargin

  @transient private lazy val schema: Schema = new Schema.Parser().parse(SchemaJson)

  def encode(block: ImageBlock): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("filename", block.filename)
    rec.put("local_hash", block.localHash)
    rec.put("data", ByteBuffer.wrap(block.data))
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): ImageBlock = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    val buf = rec.get("data").asInstanceOf[ByteBuffer]
    val data = new Array[Byte](buf.remaining())
    buf.get(data)
    ImageBlock(rec.get("filename").toString, rec.get("local_hash").toString, data)
  }
}
