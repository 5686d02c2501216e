package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSession

/** The two-level distributed prefix sum (Packing.prefixSum) is bit-equal
  * to a driver-side SEQUENTIAL prefix sum for ANY input shape — random
  * token counts (including zeros), random doc_id gaps (so buckets are
  * partially filled or entirely EMPTY), multiple languages interleaved.
  * This is the q70-style property pin for q58: the bucket-offset
  * arithmetic (bucket partials → running offsets → local windows) must
  * stay exact under refactors, not just on the fixture's dense ids.
  */
object PackingPrefixProps extends Properties("PackingPrefix") {

  // each case runs a small Spark job; bound the count
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private val spark = TestSession.spark
  import spark.implicits._

  // doc_ids drawn sparsely from a range spanning many BucketSize=64
  // buckets, so gaps and empty buckets are the norm, not the exception
  private val genDocs: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 2048L)
      lang <- Gen.oneOf("en", "de", "fr")
      toks <- Gen.choose(0L, 1000L)
    } yield (id, lang, toks))
  } yield rows.distinctBy(_._1)

  property("two-level prefix sum == sequential prefix sum, any shape") =
    forAll(genDocs) { rows =>
      val df = rows.toDF("doc_id", "lang", "n_tokens")
      val got = Packing.prefixSum(df)
        .select("doc_id", "lang", "cum").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val expected = rows.groupBy(_._2).flatMap { case (lang, docs) =>
        var acc = 0L
        docs.sortBy(_._1).map { case (id, _, toks) =>
          acc += toks
          (id, lang) -> acc
        }
      }
      got == expected
    }
}
