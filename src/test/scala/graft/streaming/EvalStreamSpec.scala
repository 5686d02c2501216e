package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession
import graft.operators.{AnnIndex, IvfIndex, PqIndex, Recall, RecallEvaluable,
  Sq8Index}

/** Quality-monitor gate for [[EvalStream]], in three pinned phases over
  * one index lifecycle:
  *
  *  1. '''Exactness''' — every tick's ledger row must equal a driver-side
  *     SEQUENTIAL replica of the whole metric pipeline (probe-cell
  *     ranking, nprobe candidate generation, exact brute force, top-k
  *     tie-breaks, integer milliunits), recomputed from the index's own
  *     persisted state tables. Same doctrine as RetrievalEvalSpec: the
  *     q106 oracle proves plan-vs-SQL agreement; this proves both
  *     compute the metric the textbook defines.
  *  2. '''Degradation detection''' — ingest vectors CONSTRUCTED (from
  *     the collected state, with the engine's own fold arithmetic) to
  *     enter canary probes' exact top-k while assigned to cells outside
  *     the probes' nprobe set: the stale-quantizer failure mode IVF
  *     deployments monitor for. The tick must drop, and
  *     [[EvalStream.degraded]] must fire against the pre-ingest floor.
  *  3. '''Retrain recovery''' — [[graft.operators.AnnIndex.rebuildWarm]]
  *     over the grown corpus re-learns the geometry; the next tick must
  *     recover above the degraded value (the full monitor→retrain loop,
  *     closed by the metric itself rather than DriftStream's ppm proxy).
  *
  * Replay idempotence (same tick id twice → one ledger row) rides phase
  * 1. The replica also re-derives each ingested vector's cell and pins
  * it against the engine's assignment — the construction cannot drift
  * from what addBatch actually did.
  */
class EvalStreamSpec extends AnyFunSuite {
  import TestSession.spark

  private val sf = "/root/testdata/sf0.01"
  private val Stride = EvalStream.ProbeStride
  private val K = EvalStream.TopK
  private val NProbeCells = graft.Dials.IvfNProbeCells

  // ---- the sequential replica of the engine's arithmetic ----

  /** The engine's left-fold dot (graft.functions.Vectors.dot): per-index
    * double products accumulated left-to-right. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private case class Vec(id: Long, e: Array[Float], n2: Double, cell: Long)
  private case class Cent(cid: Long, ce: Array[Float], cn2: Double)

  private def collectState(state: StateDir): (Seq[Vec], Seq[Cent]) = {
    val vs = state.read(IvfIndex.AssignTable, IvfIndex.AssignSchema).collect()
      .map(r => Vec(r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Double]("n2"), r.getAs[Long]("cell"))).toSeq
    val cs = state.read(IvfIndex.CentroidsTable, IvfIndex.CentroidsSchema)
      .collect()
      .map(r => Cent(r.getAs[Long]("cid"),
        r.getAs[scala.collection.Seq[Float]]("ce").toArray,
        r.getAs[Double]("cn2"))).toSeq
    (vs, cs)
  }

  /** argmax cell with the engine's (ccos, -cid) tie-break. */
  private def cellOf(e: Array[Float], n2: Double, cents: Seq[Cent]): Long =
    cents.map(c => (dot(e, c.ce) / math.sqrt(n2 * c.cn2), c.cid))
      .minBy { case (ccos, cid) => (-ccos, cid) }._2

  /** The probe's nprobe nearest cells (rankCells: ccos desc, cid asc). */
  private def probedCells(p: Vec, cents: Seq[Cent]): Set[Long] =
    cents.map(c => (dot(p.e, c.ce) / math.sqrt(p.n2 * c.cn2), c.cid))
      .sortBy { case (ccos, cid) => (-ccos, cid) }
      .take(NProbeCells).map(_._2).toSet

  /** Top-k ids by (cosine desc, vec_id asc) among `cand`, self excluded. */
  private def topK(p: Vec, cand: Seq[Vec]): Seq[Long] =
    cand.filter(_.id != p.id)
      .map(v => (dot(p.e, v.e) / math.sqrt(p.n2 * v.n2), v.id))
      .sortBy { case (cos, id) => (-cos, id) }
      .take(K).map(_._2)

  /** (n_vectors, n_probes, hits, recall_milli) — the expected tick. */
  private def replicaTick(vs: Seq[Vec], cents: Seq[Cent]): (Long, Long, Long, Long) = {
    val probes = vs.filter(_.id % Stride == 0)
    val hits = probes.map { p =>
      val pc = probedCells(p, cents)
      val served = topK(p, vs.filter(v => pc.contains(v.cell))).toSet
      topK(p, vs).count(served.contains)
    }.sum.toLong
    (vs.size.toLong, probes.size.toLong, hits,
      if (probes.isEmpty) 0L else hits * 1000L / (probes.size * K))
  }

  private def tickRow(es: EvalStream, id: Long): (Long, Long, Long, Long) = {
    val r = es.report.filter(col("tick_id") === id).collect()
    assert(r.length == 1, s"expected exactly one ledger row for tick $id")
    (r(0).getAs[Long]("n_vectors"), r(0).getAs[Long]("n_probes"),
      r(0).getAs[Long]("hits"), r(0).getAs[Long]("recall_milli"))
  }

  test("ticks equal the replica; constructed staleness degrades; warm retrain recovers") {
    val ix = new IvfIndex(spark,
      new StateDir(spark, Files.createTempDirectory("eval-ix").toString))
    ix.build(sf)
    val es = new EvalStream(spark, ix)

    // -- phase 1: exactness + replay ------------------------------------
    es.evalTick(0L)
    es.evalTick(0L) // replay: must not append a second row
    val (vs0, cents0) = collectState(ix.state)
    val want0 = replicaTick(vs0, cents0)
    val got0 = tickRow(es, 0L)
    assert(got0 == want0, s"tick 0 diverges from replica: $got0 != $want0")
    info(s"tick 0: recall_milli=${got0._4} over ${got0._2} canary probes")

    // -- phase 2: constructed staleness ---------------------------------
    // For each fully-recalled canary probe, synthesize a vector that (a)
    // outranks its 3rd exact neighbor but (b) assigns to a cell OUTSIDE
    // the probe's nprobe set — a true neighbor the served plan cannot
    // see until retrain. All arithmetic is the engine's own fold, so the
    // predicted cell/ranking is exact, not probabilistic.
    var nextId = vs0.map(_.id).max + 1
    val adversaries = Seq.newBuilder[(Long, Array[Float])]
    for (p <- vs0.filter(_.id % Stride == 0)) {
      val pc = probedCells(p, cents0)
      val exact = topK(p, vs0)
      val served = topK(p, vs0.filter(v => pc.contains(v.cell))).toSet
      if (exact.forall(served.contains)) {
        val e3cos = {
          val v3 = vs0.find(_.id == exact.last).get
          dot(p.e, v3.e) / math.sqrt(p.n2 * v3.n2)
        }
        val outside = vs0.filter(v => !pc.contains(v.cell) && v.id != p.id)
        val y = outside.maxBy(v => dot(p.e, v.e) / math.sqrt(p.n2 * v.n2))
        val found = (1 to 19).map(_ * 0.05).iterator.map { eps =>
          val v = y.e.zip(p.e).map { case (ye, pe) =>
            (ye + eps * (pe - ye)).toFloat }
          (v, dot(v, v))
        }.find { case (v, n2v) =>
          !pc.contains(cellOf(v, n2v, cents0)) &&
            dot(v, p.e) / math.sqrt(n2v * p.n2) > e3cos
        }
        found.foreach { case (v, _) =>
          while (nextId % Stride == 0) nextId += 1
          adversaries += ((nextId, v)); nextId += 1
        }
      }
    }
    val advs = adversaries.result()
    assert(advs.size >= 2,
      s"construction found only ${advs.size} adversarial vectors — fixture drifted?")

    import spark.implicits._
    ix.addBatch(advs.toDF("vec_id", "embedding"))
    es.evalTick(1L)
    val (vs1, cents1) = collectState(ix.state)
    // the engine assigned each adversary to the cell the replica predicted
    val engCells = vs1.map(v => v.id -> v.cell).toMap
    advs.foreach { case (id, e) =>
      assert(engCells(id) == cellOf(e, dot(e, e), cents0),
        s"engine assigned $id to a different cell than the construction")
    }
    val got1 = tickRow(es, 1L)
    assert(got1 == replicaTick(vs1, cents1),
      "tick 1 diverges from replica after ingest")
    assert(got1._4 < got0._4,
      s"constructed staleness not detected: ${got1._4} !< ${got0._4}")
    assert(es.degraded(got0._4), "degraded() must fire below the tick-0 floor")
    info(s"tick 1: recall_milli=${got1._4} after ${advs.size} stale-cell ingests")

    // -- phase 3: retrain recovery --------------------------------------
    val grown = Files.createTempDirectory("eval-corpus").toString
    graft.Tables.embeddings(spark, sf)
      .unionByName(advs.toDF("vec_id", "embedding")
        .withColumn("label", lit(0)))
      .write.mode("overwrite").parquet(s"$grown/embeddings.parquet")
    ix.rebuildWarm(grown)
    es.evalTick(2L)
    val (vs2, cents2) = collectState(ix.state)
    val got2 = tickRow(es, 2L)
    assert(got2 == replicaTick(vs2, cents2),
      "tick 2 diverges from replica after retrain")
    assert(got2._4 > got1._4,
      s"warm retrain did not recover recall: ${got2._4} !> ${got1._4}")
    assert(!es.degraded(got1._4),
      "degraded() must clear once the latest tick is back above the floor")
    info(s"tick 2: recall_milli=${got2._4} after warm retrain on the grown corpus")
  }

  // ---- family-generic monitoring (PQ / SQ8) ----

  /** Exact top-k replica in the FAMILY's metric (cosine desc or squared
    * L2 asc — the same expressions Recall.againstExact declares). */
  private def exactTopK(p: Vec, all: Seq[Vec], m: Recall.Metric): Seq[Long] =
    all.filter(_.id != p.id)
      .map { v =>
        val d = dot(p.e, v.e)
        val s = m match {
          case Recall.CosineDesc => -(d / math.sqrt(p.n2 * v.n2))
          case Recall.L2Asc => p.n2 - 2.0 * d + v.n2
        }
        (s, v.id)
      }.sortBy(identity).take(K).map(_._2)

  /** The family-generic monitor contract, minus the IVF deep replica:
    * the family's SERVE plans are pinned ≡ their declared queries by
    * PqIndexSpec/Sq8IndexSpec — what the monitor adds is the metric
    * computation, so the pin here is tick ≡ (engine served ids) ∩
    * (driver exact replica in the family's own metric), plus replay
    * idempotence. */
  private def familyTick(ix: AnnIndex with RecallEvaluable): Unit = {
    ix.build(sf)
    val es = new EvalStream(spark, ix)
    es.evalTick(0L)
    es.evalTick(0L) // replay: one row
    val all = ix.floatBase.collect()
      .map(r => Vec(r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray,
        r.getAs[Double]("n2"), 0L)).toSeq
    val probes = all.filter(_.id % Stride == 0)
    val served = ix.queryWhere(col("vec_id") % Stride === 0, K).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = probes.map { p =>
      exactTopK(p, all, ix.metric)
        .count(served.getOrElse(p.id, Set.empty).contains)
    }.sum.toLong
    val want = (all.size.toLong, probes.size.toLong, hits,
      hits * 1000L / (probes.size * K))
    val got = tickRow(es, 0L)
    assert(got == want, s"${ix.getClass.getSimpleName} tick diverges: $got != $want")
    info(s"${ix.getClass.getSimpleName}: recall_milli=${got._4} over ${got._2} probes")
  }

  test("PQ family: tick equals served ∩ exact replica in squared-L2; replay no-op") {
    familyTick(new PqIndex(spark,
      new StateDir(spark, Files.createTempDirectory("eval-pq").toString)))
  }

  test("SQ8 family: tick equals served ∩ exact replica in cosine; replay no-op") {
    familyTick(new Sq8Index(spark,
      new StateDir(spark, Files.createTempDirectory("eval-sq").toString)))
  }

  test("tick refuses a base corrupted by re-ingested ids") {
    import spark.implicits._
    val ix = new Sq8Index(spark,
      new StateDir(spark, Files.createTempDirectory("eval-dup").toString))
    ix.build(sf)
    // violate AnnIndex.addBatch's NEW-ids contract on purpose: id 0
    // already exists from the build — recall over the double-counted
    // base would read past 1000, so the monitor must refuse, not
    // ledger a lie (this is exactly the corruption a bootstrap-then-
    // re-ingest-the-same-corpus wiring mistake produces).
    val dup = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === 0L).select("vec_id", "embedding")
    ix.addBatch(dup)
    val es = new EvalStream(spark, ix)
    val e = intercept[IllegalArgumentException](es.evalTick(0L))
    assert(e.getMessage.contains("duplicate vec_ids"))
  }
}
