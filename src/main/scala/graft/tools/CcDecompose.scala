package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Dev tool: decompose q54's at-scale cost into its three terms — the
  * private pair-graph solve (the LSH chain materialized into a pinned
  * edge list), the CC fixpoint rounds (over the ALREADY-pinned pairs),
  * and the cluster-stats output — so the sf30 headline (q54 is the
  * largest single row at that scale) is attributable instead of opaque.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_BAND_SHARDS=2]
  *        tools/jrun.sh graft.tools.CcDecompose
  *
  * The pair term is also the A/B surface for the band-shard dial INSIDE
  * q54's solve (r13 only measured it through q20's path): run once with
  * shards=1 and once with shards=2 and compare the `pairs_solve` lines —
  * the CC term is held constant by construction (it consumes the pinned
  * edges either way).
  */
object CcDecompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = Tables.configureMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    Tables.corpusConfigs(sfDir, cpus).foreach { case (k, v) => builder.config(k, v) }
    // SPARK_GRAFT_CC_TWOHOP=1: A/B the two-hop round form (see
    // Dedup.TwoHopConf) without touching the session-default plan
    sys.env.get("SPARK_GRAFT_CC_TWOHOP")
      .foreach(v => builder.config(Dedup.TwoHopConf,
        (v == "1" || v.equalsIgnoreCase("true")).toString))
    // SPARK_GRAFT_CC_CONTRACT=0: A/B the star-contraction pre-pass (on by
    // default — see Dedup.StarContractConf)
    sys.env.get("SPARK_GRAFT_CC_CONTRACT")
      .foreach(v => builder.config(Dedup.StarContractConf,
        (v == "1" || v.equalsIgnoreCase("true")).toString))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CCDECOMP $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    println(s"CCDECOMP dir=$sfDir shards=" +
      spark.conf.get(Dedup.BandShardsConf, "1"))
    // term 1: the private pair-graph solve — the full LSH chain (shingle,
    // minhash, band, bucket join, verify) materialized into a pinned,
    // lineage-free edge list. Eager pin so the term's wall is ITS OWN.
    val pairs = t("pairs_solve") {
      val p = Dedup.minhashPairs(spark, sfDir)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(eager = true)
      println(s"CCDECOMP pairs_rows       ${p.count()}")
      p
    }
    // term 2: the CC fixpoint over the pinned pairs — per-round pins,
    // probes, pointer jumps; nothing of the LSH chain re-runs (input is
    // a LogicalRDD).
    val labels = t("cc_rounds")(Dedup.connectedComponents(pairs))
    // term 3: the declared row's output aggregate (q54's tail).
    t("cluster_stats") {
      val n = labels.groupBy(col("lbl").as("cluster_id"))
        .agg(count(lit(1)).as("n_docs"), max(col("v")).as("max_doc"))
        .count()
      println(s"CCDECOMP clusters         $n")
    }
    spark.stop()
  }
}
