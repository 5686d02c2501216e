package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSession

/** The winnowing guarantee (Schleimer et al. §2), property-tested: for ANY
  * two documents sharing a contiguous passage of ≥ W+K−1 tokens, the
  * winnowed fingerprint sets intersect — whatever the surrounding text,
  * passage position, or passage length. And token-disjoint documents
  * never share a fingerprint (md5 collisions aside, which 48 bits make
  * vanishingly unlikely at this case count).
  */
object WinnowGuaranteeProps extends Properties("WinnowGuarantee") {

  // each case runs a small Spark job; bound the count
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private val spark = TestSession.spark
  import spark.implicits._

  private def fps(a: String, b: String): (Set[Long], Set[Long]) = {
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val rows = Winnow.fingerprints(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    (rows.filter(_._1 == 1L).map(_._2).toSet,
      rows.filter(_._1 == 2L).map(_._2).toSet)
  }

  private def words(prefix: String, n: Int): Gen[Seq[String]] =
    Gen.listOfN(n, Gen.choose(0, 9999)).map(_.map(i => s"$prefix$i"))

  private val genCase = for {
    passLen <- Gen.choose(Winnow.W + Winnow.K - 1, 40)
    passage <- words("p", passLen)
    preA <- Gen.choose(0, 20).flatMap(words("a", _))
    postA <- Gen.choose(0, 20).flatMap(words("b", _))
    preB <- Gen.choose(0, 20).flatMap(words("c", _))
    postB <- Gen.choose(0, 20).flatMap(words("d", _))
  } yield (
    (preA ++ passage ++ postA).mkString(" "),
    (preB ++ passage ++ postB).mkString(" "))

  property("shared passage of >= W+K-1 tokens => shared fingerprint") =
    forAll(genCase) { case (a, b) =>
      val (fa, fb) = fps(a, b)
      (fa & fb).nonEmpty
    }

  property("token-disjoint docs share no fingerprint") =
    forAll(
      Gen.choose(Winnow.K, 30).flatMap(words("x", _)),
      Gen.choose(Winnow.K, 30).flatMap(words("y", _))) { (as, bs) =>
      val (fa, fb) = fps(as.mkString(" "), bs.mkString(" "))
      (fa & fb).isEmpty
    }
}
