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

  test("append publishes a delta dir; read unions the chain") {
    val root = Files.createTempDirectory("sd-").toString
    val st = new StateDir(spark, root)
    st.append("t", Seq((1L, "a")).toDF("k", "v")) // first publish = full base
    st.append("t", Seq((2L, "b")).toDF("k", "v"))
    st.append("t", Seq((3L, "c")).toDF("k", "v"))
    assert(st.read("t", schema).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    // v0 is the base (no marker), v1/v2 are deltas
    assert(!new java.io.File(s"$root/t/v0/_DELTA").exists())
    assert(new java.io.File(s"$root/t/v1/_DELTA").exists())
    assert(new java.io.File(s"$root/t/v2/_DELTA").exists())
  }

  test("every CompactEvery-th append folds the chain into a full version") {
    val root = Files.createTempDirectory("sd-").toString
    val st = new StateDir(spark, root, compactEvery = 3)
    (0 until 8).foreach(i => st.append("t", Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(st.read("t", schema).collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 8L))
    // the LIVE chain (walk down from the pointer) never exceeds compactEvery
    // dirs; superseded chains kept as reader cushion don't count
    val latest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/t.latest"))).trim.toInt
    val liveDeltas = Iterator.iterate(latest)(_ - 1)
      .takeWhile(v => new java.io.File(s"$root/t/v$v/_DELTA").exists()).size
    assert(liveDeltas < 3, s"live chain too long: $liveDeltas deltas from v$latest")
  }

  test("gc never deletes the base a live delta chain stands on") {
    val root = Files.createTempDirectory("sd-").toString
    val st = new StateDir(spark, root, compactEvery = 1000) // no compaction
    st.write("t", Seq((0L, "base")).toDF("k", "v"))
    (1 until 10).foreach(i => st.append("t", Seq((i.toLong, s"v$i")).toDF("k", "v")))
    // current version is 9; naive retain-last-K would have dropped v0..v5,
    // but v0 is the base of every live chain
    assert(new java.io.File(s"$root/t/v0").exists())
    assert(st.read("t", schema).collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 10L))
    // a full write supersedes the chain; subsequent publishes GC it away
    (0 until StateDir.KeepVersions + 1).foreach(i =>
      st.write("t", Seq((100L + i, "w")).toDF("k", "v")))
    assert(!new java.io.File(s"$root/t/v0").exists())
  }

  test("append after a crash-orphaned delta dir overwrites it cleanly") {
    val root = Files.createTempDirectory("sd-").toString
    val st = new StateDir(spark, root)
    st.append("t", Seq((1L, "a")).toDF("k", "v"))
    st.append("t", Seq((2L, "b")).toDF("k", "v"))
    // simulate a crash AFTER the parquet write of v2 but BEFORE the pointer
    // bump: a complete-looking orphan delta dir the pointer never adopted
    val orphan = new java.io.File(s"$root/t/v2")
    orphan.mkdirs()
    Files.write(java.nio.file.Paths.get(s"$root/t/v2/_SUCCESS"), Array.empty[Byte])
    Files.write(java.nio.file.Paths.get(s"$root/t/v2/_DELTA"), Array.empty[Byte])
    Files.write(java.nio.file.Paths.get(s"$root/t/v2/junk.parquet"), "junk".getBytes)
    // reads resolve via the pointer (v1) and never see the orphan
    assert(st.read("t", schema).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // the replayed append claims version 2 again, replacing the orphan
    st.append("t", Seq((3L, "c")).toDF("k", "v"))
    assert(st.read("t", schema).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
    assert(!new java.io.File(s"$root/t/v2/junk.parquet").exists())
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
