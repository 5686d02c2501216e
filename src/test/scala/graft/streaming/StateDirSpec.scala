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

  test("old versions are GC'd after each publish; reads resolve the latest") {
    val root = Files.createTempDirectory("sd-").toString
    val st = new StateDir(spark, root)
    (0 until 6).foreach(i => st.write("t", Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val kept = new java.io.File(s"$root/t").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName).sorted.toSeq
    // retain-last-K: current (v5) plus one for in-flight readers (v4).
    assert(kept == (6 - StateDir.KeepVersions until 6).map(i => s"v$i"))
    assert(st.read("t", schema).collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("torn/corrupt pointer recovers to the newest complete version") {
    val root = Files.createTempDirectory("sd-").toString
    val st = new StateDir(spark, root)
    st.write("t", Seq((1L, "a")).toDF("k", "v"))
    st.write("t", Seq((2L, "b")).toDF("k", "v"))
    // simulate a crash that left a torn (empty) pointer file
    Files.write(java.nio.file.Paths.get(s"$root/t.latest"), Array.empty[Byte])
    assert(st.read("t", schema).collect().map(_.getLong(0)).toSeq == Seq(2L))
    // and the next write self-heals: bumps past the recovered version
    st.write("t", Seq((3L, "c")).toDF("k", "v"))
    assert(st.read("t", schema).collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("locked() is reentrant and serializes concurrent read-modify-writes") {
    val st = new StateDir(spark, Files.createTempDirectory("sd-").toString)
    st.write("t", Seq((0L, "n")).toDF("k", "v"))
    // nested locked() must not deadlock or throw OverlappingFileLockException
    st.locked { st.locked { st.write("t", Seq((1L, "n")).toDF("k", "v")) } }
    val threads = (0 until 4).map { _ =>
      new Thread(() => (0 until 3).foreach { _ =>
        st.locked {
          val cur = st.read("t", schema).first().getLong(0)
          st.write("t", Seq((cur + 1, "n")).toDF("k", "v"))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // 12 serialized increments: none lost to a competing N+1 publish
    assert(st.read("t", schema).first().getLong(0) == 13L)
  }
}
