package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** q54: near-dup clusters = connected components of the q20 pair graph.
  *
  * Ground truth is an in-test union-find over the SAME pair list the public
  * q20 query emits — so the spec pins the distributed min-label/pointer-jump
  * fixpoint against a sequential oracle, independent of the DuckDB twin.
  * A synthetic chain graph additionally pins multi-hop closure (label must
  * travel the whole path, not one hop).
  */
class DedupClustersSpec extends AnyFunSuite {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Run `body` with the driver-local CC fast path disabled, so the leg
    * exercises the DISTRIBUTED fixpoint regardless of fixture size. */
  private def forceDistributed[A](body: => A): A = {
    val s = graft.TestSession.spark
    s.conf.set(Dedup.LocalCcMaxConf, "0")
    try body finally s.conf.unset(Dedup.LocalCcMaxConf)
  }

  test("local union-find fast path == distributed fixpoint (q54 hash input)") {
    val s = TestSession.spark
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    // fixture pair graphs are far below the default localMaxPairs ceiling,
    // so the default q54 path IS the local solve; pin it against the
    // forced-distributed fixpoint
    val local = Dedup.q54DedupClusters(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val distributed = forceDistributed {
      Dedup.q54DedupClusters(s, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(local == distributed, "local union-find diverged from the fixpoint")
    // adversarial shapes through the LOCAL path (the distributed twins of
    // these shapes run in the star-contraction leg below)
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(chain).collect().forall(_.getLong(1) == 0L))
    val bridged = ((1L to 4L).map(i => (0L, i)) ++
      (11L to 14L).map(i => (10L, i)) ++ Seq((4L, 14L))).toDF("doc_a", "doc_b")
    val lbl = Dedup.connectedComponents(bridged).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lbl.values.toSet == Set(0L) && lbl.size == 10)
  }

  test("q54 clusters == sequential union-find over the q20 pair graph") {
    val s = TestSession.spark
    val d = "/root/testdata/sf0.001"
    val pairs = Dedup.q20MinhashNeardup(s, d)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    val roots = unionFind(pairs)
    val expected = roots.groupBy(_._2).map { case (root, members) =>
      (root, members.size.toLong, members.keys.max)
    }.toSet
    val got = Dedup.q54DedupClusters(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // canonical id is the component min: no member below its cluster_id
    assert(got.forall { case (cid, _, mx) => cid <= mx })
  }

  test("connectedComponents closes a 64-node chain to one component") {
    val s = TestSession.spark
    import s.implicits._
    // path 0-1-2-...-63: worst case for one-hop propagation; pointer
    // jumping must still converge inside the round cap (forced
    // distributed — the local fast path would trivialize the leg)
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = forceDistributed(Dedup.connectedComponents(chain).collect())
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 64)
    assert(labels.forall(_._2 == 0L), s"all labels must be 0, got ${labels.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("reliable-checkpoint mode yields identical labels (and q54 hash input)") {
    val s = TestSession.spark
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val default = Dedup.q54DedupClusters(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ckpt = java.nio.file.Files.createTempDirectory("cc-reliable-").toString
    val hadDir = s.sparkContext.getCheckpointDir
    s.sparkContext.setCheckpointDir(ckpt)
    s.conf.set(Dedup.ReliableCcConf, "true")
    s.conf.set(Dedup.LocalCcMaxConf, "0") // reliable mode pins ROUND files
    try {
      // the solver rounds now persist into the checkpoint dir: an executor
      // lost mid-fixpoint recomputes from the last round's reliable files
      // instead of failing the query
      val reliable = Dedup.q54DedupClusters(s, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(reliable == default)
      val written = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(written > 0, "reliable mode must write round files to the checkpoint dir")
      // the raw solver honors the conf too
      val chain = Seq((0L, 1L)).toDF("doc_a", "doc_b")
      assert(Dedup.connectedComponents(chain).count() == 2L)
    } finally {
      s.conf.set(Dedup.ReliableCcConf, "false")
      s.conf.unset(Dedup.LocalCcMaxConf)
      hadDir.foreach(s.sparkContext.setCheckpointDir)
    }
  }

  test("two-hop mode yields identical labels (q54 hash input) in fewer rounds") {
    val s = TestSession.spark
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    val default = Dedup.q54DedupClusters(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    s.conf.set(Dedup.TwoHopConf, "true")
    try forceDistributed {
      val twoHop = Dedup.q54DedupClusters(s, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(twoHop == default, "two-hop labels diverged from single-hop")
      // the worst case for propagation: a long chain still closes
      val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val labels = Dedup.connectedComponents(chain).collect()
      assert(labels.length == 64 && labels.forall(_.getLong(1) == 0L))
    } finally s.conf.set(Dedup.TwoHopConf, "false")
  }

  test("star contraction yields identical labels (q54 hash input) to the direct fixpoint") {
    val s = TestSession.spark
    import s.implicits._
    val d = "/root/testdata/sf0.001"
    // default is CONTRACTED (StarContractConf on) — compare against the
    // direct path explicitly
    val contracted = Dedup.q54DedupClusters(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    s.conf.set(Dedup.StarContractConf, "false")
    try forceDistributed {
      val direct = Dedup.q54DedupClusters(s, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(contracted == direct, "contracted labels diverged from direct")
    } finally s.conf.unset(Dedup.StarContractConf)
    // adversarial shapes through the CONTRACTED DISTRIBUTED default: a
    // long chain (worst case for propagation — contraction halves it), a
    // pure star (residual is EMPTY — the expand's coalesce arm), two
    // disjoint stars bridged at their rims (residual is one edge)
    forceDistributed {
      val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      assert(Dedup.connectedComponents(chain).collect()
        .forall(_.getLong(1) == 0L))
      val star = (1L to 8L).map(i => (0L, i)).toDF("doc_a", "doc_b")
      assert(Dedup.connectedComponents(star).collect()
        .forall(_.getLong(1) == 0L))
      val bridged = ((1L to 4L).map(i => (0L, i)) ++
        (11L to 14L).map(i => (10L, i)) ++ Seq((4L, 14L))).toDF("doc_a", "doc_b")
      val lbl = Dedup.connectedComponents(bridged).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(lbl.values.toSet == Set(0L) && lbl.size == 10)
    }
  }

  test("two disjoint cliques stay two clusters") {
    val s = TestSession.spark
    import s.implicits._
    val edges = Seq((10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp(10L) == 10L && comp(11L) == 10L && comp(12L) == 10L)
    assert(comp(20L) == 20L && comp(21L) == 20L)
  }
}
