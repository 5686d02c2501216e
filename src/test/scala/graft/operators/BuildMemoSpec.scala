package graft.operators

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** r12 lock-granularity pins for [[BuildMemo]] — the machinery behind the
  * q107/q108 streaming-state fixtures. The deterministic form of the "no
  * cross-blocking" contract: a build for key B completes WHILE key A's
  * build is still holding A's slot lock (pre-r12 the q107 build ran under
  * one global memo lock — 28 s at sf0.1, 344 s at sf30 — so any other
  * corpus's build waited on it). Wall-clock ordering of two real Spark
  * streaming builds is scheduler-noise-bound on a shared context; this
  * pins the mechanism itself. */
class BuildMemoSpec extends AnyFunSuite {

  test("a build for one key does not block a different key's build") {
    val memo = new BuildMemo(4, "graft-buildmemo-spec-")
    val aEntered = new CountDownLatch(1)
    val aRelease = new CountDownLatch(1)
    val bDone = new CountDownLatch(1)
    @volatile var err: Throwable = null
    val a = new Thread(() =>
      try memo.get("A", "s") { _ => aEntered.countDown(); aRelease.await() }
      catch { case t: Throwable => err = t })
    a.start()
    assert(aEntered.await(10, TimeUnit.SECONDS), "A's build never started")
    // A is mid-build, holding its slot lock. B must complete regardless.
    val b = new Thread(() =>
      try { memo.get("B", "s") { _ => () }; bDone.countDown() }
      catch { case t: Throwable => err = t })
    b.start()
    assert(bDone.await(10, TimeUnit.SECONDS),
      "B's build blocked behind A's in-flight build — global lock regression")
    aRelease.countDown()
    a.join(10000); b.join(10000)
    if (err != null) throw err
  }

  test("two callers of ONE key serialize and share the build") {
    val memo = new BuildMemo(4, "graft-buildmemo-spec-")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map(_ => new Thread(() =>
      memo.get("K", "s") { _ => builds.incrementAndGet(); Thread.sleep(50) }))
    threads.foreach(_.start()); threads.foreach(_.join(10000))
    assert(builds.get() == 1, "same key+stamp must build exactly once")
  }

  test("a stamp change rebuilds; same stamp serves the memoized root") {
    val memo = new BuildMemo(4, "graft-buildmemo-spec-")
    var n = 0
    val r1 = memo.get("K", "s1") { _ => n += 1 }
    val r2 = memo.get("K", "s1") { _ => n += 1 }
    assert(r1 == r2 && n == 1)
    val r3 = memo.get("K", "s2") { _ => n += 1 }
    assert(n == 2 && r3 != r1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(r1)),
      "replaced root must be deleted")
  }
}
