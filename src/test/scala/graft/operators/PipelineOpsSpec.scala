package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Invariants of the round-6 pipeline operators that the oracle hash
  * alone doesn't state:
  *
  *  - q61: the overlapping windows COVER every token position exactly
  *    (the runt rule drops only fully-contained windows), sizes never
  *    exceed the context length, ordinals stay contiguous;
  *  - q63: Hamilton apportionment sums to the budget EXACTLY and no
  *    group strays more than one unit from its proportional floor
  *    (quota property);
  *  - q65: the shard manifest CONSERVES the survivors' chunk tokens
  *    (nothing lost or duplicated between curation and the manifest)
  *    and no shard overflows the budget by more than one window's
  *    tail.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSession.spark
  import spark.implicits._

  // 35-104 tokens per doc, stopword every 6th token (survives the q56
  // floors); docs 100-119 are exact clones of 0-19 so the dedup gate in
  // q65 actually drops something
  private def body(i: Int): String = {
    val n = 35 + (i * 7) % 70
    (0 until n).map(t => if (t % 6 == 0) "the" else s"tok${(i * 31 + t) % 97}")
      .mkString(" ")
  }
  private def corpus = (0 until 120).map { i =>
    val text = if (i >= 100) body(i - 100) else body(i)
    (i.toLong, text, if (i % 2 == 0) "en" else "es", s"src${i % 4}")
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("pipeline-ops-").toString
    corpus.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q61: chunks cover every token exactly once-or-more; runt rule holds") {
    val byDoc = Chunking.q61ContextChunks(spark, dir).collect()
      .groupBy(_.getLong(0))
    val nTok = corpus.map { case (id, text, _, _) =>
      id -> text.split(" ").length
    }.toMap
    assert(byDoc.keySet == nTok.keySet)
    byDoc.foreach { case (id, cs) =>
      val n = nTok(id)
      val covered = cs.flatMap(r =>
        r.getInt(2) until (r.getInt(2) + r.getInt(3))).toSet
      assert(covered == (0 until n).toSet, s"doc $id: window union != [0, $n)")
      cs.foreach { r =>
        assert(r.getInt(3) <= Chunking.Chunk)
        assert(r.getString(4).split(" ").length == r.getInt(3))
      }
      assert(cs.map(_.getInt(1)).sorted.sameElements(0 until cs.length),
        s"doc $id: ordinals not contiguous")
      // every kept non-initial window adds NEW tokens (no fully-contained
      // window survives the runt rule)
      assert(cs.filter(_.getInt(1) > 0)
        .forall(_.getInt(3) > Chunking.Chunk - Chunking.Stride))
    }
  }

  test("q63: Σalloc = budget exactly; every group within one unit of its floor") {
    val rows = Mixing.q63MixAllocation(spark, dir).collect()
    val cTotal = rows.map(_.getLong(2)).sum
    val budget = cTotal / 2
    assert(rows.map(_.getLong(4)).sum == budget,
      "largest-remainder allocation must exhaust the budget exactly")
    rows.foreach { r =>
      val floor = r.getLong(3)
      assert(floor == r.getLong(2) * budget / cTotal)
      assert(r.getLong(4) == floor || r.getLong(4) == floor + 1,
        s"group ${r.getString(0)}/${r.getString(1)} violates the quota property")
    }
  }

  test("q65: manifest conserves survivor chunk tokens; shards bounded") {
    val survivors = Curation.q56Curation(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(survivors.nonEmpty && survivors.size < corpus.size,
      "fixture must exercise both curation gates")
    val chunkTokens = Chunking.q61ContextChunks(spark, dir).collect()
      .filter(r => survivors(r.getLong(0)))
      .map(_.getInt(3).toLong)
    val manifest = Export.q65TrainingExport(spark, dir).collect()
    assert(manifest.map(_.getLong(3)).sum == chunkTokens.sum,
      "token totals diverge between chunking and the shard manifest")
    assert(manifest.map(_.getLong(2)).sum == chunkTokens.length,
      "chunk counts diverge")
    manifest.foreach { r =>
      assert(r.getLong(3) <= Export.ShardBudget + Chunking.Chunk - 1,
        s"shard ${r.getString(0)}/${r.getInt(1)} overflows the budget")
    }
    // per-lang shard ids are contiguous from 0 (the prefix sum leaves no
    // holes)
    manifest.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(0 until rs.length),
        s"$lang: shard ids not contiguous")
    }
  }
}
