package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, local mode). */
object TestSession {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class EntrySmokeSpec extends AnyFunSuite {
  test("entry flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSession.spark).count() > 0)
  }
  test("every declared query runs on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(TestSession.spark, TestSession.sf).count()
      assert(n >= 0, s"$name failed")
    }
  }
  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("queries iteration order is structural and serve-pricing-safe") {
    // Bench iterates queries in collection order, and the disclosed pricing
    // policy depends on it: q54 computes the shared cluster state its five
    // servers are serve-priced against, and q40 trains the IVF memo q86
    // serves. A HashMap's incidental order could silently re-price them.
    val order = SparkEntry.queries.keys.toVector
    assert(SparkEntry.queries.isInstanceOf[scala.collection.immutable.VectorMap[_, _]],
      "queries must be an insertion-ordered collection")
    def before(a: String, b: String): Unit =
      assert(order.indexOf(a) >= 0 && order.indexOf(a) < order.indexOf(b),
        s"$a must precede $b in SparkEntry.queries")
    Seq("q56_curation", "q65_training_export", "q67_dup_rate_by_source",
        "q68_cluster_keeper", "q84_leakfree_split")
      .foreach(before("q54_dedup_clusters", _))
    before("q40_ivf_ann", "q86_served_ann")
    before("q70_winnow_pairs", "q89_dup_spans")
    before("q92_ivfpq_ann", "q93_served_pqann")
    before("q95_bm25_topk", "q96_served_bm25")
    // q99 serves from the session memos q86 (IVF) and q96 (lexical) build
    before("q86_served_ann", "q99_served_hybrid")
    before("q96_served_bm25", "q99_served_hybrid")
    // and the full declared order is the numeric one — any insertion slip
    // (a new query landing out of place) is caught here, not in a re-priced
    // bench row three rounds later. (Numeric, not lexicographic: q100
    // follows q99.)
    def qNum(name: String): Int = name.drop(1).takeWhile(_.isDigit).toInt
    assert(order == order.sortBy(qNum), "queries must stay in q-number order")
  }

  test("plan contract: no non-atomic top-level column in any declared output") {
    // Array/map/struct/binary columns hash differently across engines'
    // dataframe bridges, and generic comparators cannot sort array cells
    // (the q45/q69 doctrine: export a canonical string form instead).
    // This turns the doctrine into a contract so a future query can't
    // silently declare a raw array output.
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(TestSession.spark, TestSession.sf).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] ||
                  f.dataType == BinaryType =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty, s"non-atomic declared output columns: $offenders")
  }

  test("plan contract: no CartesianProduct in any declared query") {
    // the 100 TB line in the sand: every join must be keyed or broadcast —
    // a cartesian between data-scale sides never survives a scale-up.
    // (crossJoin against a broadcast-bounded side plans as
    // BroadcastNestedLoopJoin, which this permits by design.)
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(TestSession.spark, TestSession.sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }

  test("plan contract: no interpreted HigherOrderFunction in any declared query") {
    // HOFs are CodegenFallback — an interpreted lambda dispatch per
    // element, per row. The native-expression sweep (TextExpressions)
    // removed every per-row/per-token one; this pins the invariant so a
    // future query can't silently reintroduce one. Allowlisted: the IVF
    // ordered centroid fold (aggregate over array_sort(collect_list)) —
    // kept DELIBERATELY because the sorted fold makes float summation
    // order-deterministic for the oracle, and it runs over |cells|
    // grouped rows, not corpus rows. q40 trains inline; q75 shares the
    // training CTEs.
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    // q92 shares the same fold in its per-subspace codebook training
    // (Pq.codebooksOf); its encode/serve path is HOF-free by design.
    // q98 trains the coarse quantizer inline for its ANN vector leg
    // q101 trains the coarse quantizer inline like q40 (label-filtered
    // serve over the same trained assignment)
    // q106 evaluates the q40 serve against brute force — both legs hang
    // off the same inline training subtree (the recall row's whole point
    // is pricing the SHIPPED q40 plan, training fold included)
    // q72 regroups its bounded |labels|·dims centroid table into ordered
    // centroid vectors (array_sort/transform over |labels| grouped rows —
    // the same tiny-group rationale as the Lloyd fold); the corpus-scale
    // distance stage is native graft_vmilli/graft_dotl, HOF-free
    // q27's bucket-grain verify (r12) is the one MEASURED exception to
    // the per-row rule: its HOF enumerates pairs inside hot-guard-capped
    // band buckets around the COMPILED graft_isectn merge walk — the
    // interpreted part is per-pair dispatch, the work inside each call is
    // native, and the HOF is what deleted the pair-proportional array
    // shuffle that was the engine's largest scale cost (sf30: 304 →
    // 42.5 s, BASELINE §r12). Per-element-interpreted-WORK stays banned.
    // (q20 tried the same shape in r12 and measured SLOWER — its per-pair
    // payload is 24 fixed-width longs, which the joins move faster than a
    // lambda evaluator enumerates; rejected, BASELINE §r12 — so it stays
    // OFF this list on purpose.)
    val allowed = Set("q40_ivf_ann", "q75_semantic_dedup", "q92_ivfpq_ann",
      "q98_hybrid_ann", "q101_filtered_ann", "q106_ann_recall",
      "q72_centroid_confusion", "q27_ngram_jaccard")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (allowed(name)) None
      else {
        val hofs = fn(TestSession.spark, TestSession.sf)
          .queryExecution.optimizedPlan
          .collect { case p => p.expressions.flatMap(_.collect {
            case h: HigherOrderFunction => h.prettyName }) }
          .flatten
        if (hofs.isEmpty) None else Some(s"$name: ${hofs.mkString(",")}")
      }
    }
    assert(offenders.isEmpty, s"interpreted HOFs in declared queries: $offenders")
  }
}
