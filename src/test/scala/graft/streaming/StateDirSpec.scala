package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Versioned state tables (S6/S7): empty-read, append-by-union,
  * read-modify-WRITE without self-overwrite, truncate, version isolation. */
class StateDirSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("missing table reads empty with declared schema") {
    val st = new StateDir(spark, Files.createTempDirectory("sd-").toString)
    val df = st.read("nope", schema)
    assert(df.isEmpty && df.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(!st.exists("nope"))
  }

  test("read-modify-write on the SAME table is safe (versioned swap)") {
    val st = new StateDir(spark, Files.createTempDirectory("sd-").toString)
    st.write("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    // the new version's plan READS the current version — must not corrupt.
    val bumped = st.read("t", schema)
      .withColumn("v", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.lit("!")))
    st.write("t", bumped)
    val out = st.read("t", schema).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a!", 2L -> "b!"))
  }

  test("truncate empties but keeps the table existing") {
    val st = new StateDir(spark, Files.createTempDirectory("sd-").toString)
    st.write("t", Seq((1L, "a")).toDF("k", "v"))
    st.truncate("t", schema)
    assert(st.read("t", schema).isEmpty && st.exists("t"))
  }
}
