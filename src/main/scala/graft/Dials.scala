package graft

/** THE SCALE DIALS — every fixture-tuned capacity constant that must be
  * re-sized before pointing the engine at a real corpus, in one place
  * with its 100×-scale guidance. Operators read their tuning from here
  * (each keeps a local alias so call sites and oracles are unchanged);
  * semantic constants (shingle K, band counts whose pigeonhole
  * completeness proofs depend on them, report top-Ks) stay with their
  * operators ON PURPOSE — changing those changes answers, not capacity.
  *
  * The fixture values are sized for /root/testdata (sf ≤ 0.1, ≤ ~5k docs
  * / vectors) and verified by the recall/guard suites; the guidance
  * column is what a 1000-executor, ~100 TB deployment starts from.
  */
object Dials {

  /** IVF cell count (Lloyd centroids). Fixture: 8 cells over ≤ 5k
    * vectors ≈ 600 vectors/cell. At scale the standard sizing is
    * ~√N cells (1e9 vectors → ~32k cells): per-cell candidate lists stay
    * executor-sized and the centroid table stays broadcastable (32k ×
    * dim floats ≈ 8 MB at dim 64). MEASURED clusterability story
    * (BASELINE §sf1; reproduce with `graft.tools.AnnDialSweep` — run it
    * FIRST on any new corpus): the √N guidance presumes clusterable
    * embeddings, and the sf1 three-corpus sweep brackets it — on a
    * PLANTED-cluster corpus (same-cluster cos ≈ 0.7, the realistic
    * case) √N cells reach recall@3 = 1.0 at nprobe 1 (1% of the corpus
    * per probe, 28× less work than the fixture dials for better
    * recall); on a hard-overlap corpus (cos ≈ 0.28) recall degrades
    * gracefully (0.47 @ nprobe 4 → 0.67 @ 16); only on NEAR-RANDOM
    * vectors does recall collapse to tracking the candidate fraction
    * (0.133 @ nprobe 4). So K and [[IvfNProbeCells]] move TOGETHER
    * against a measured recall floor on the real corpus, never
    * independently. Retrain cadence is DriftStream's signal, not a
    * dial. */
  val IvfCells = 8

  /** IVF nprobe — the recall dial: each probe searches its nprobe
    * nearest cells. Fixture: 4 of 8 measures recall@3 0.867 against the
    * pinned 0.6 floor (AnnRecallSpec) while touching ~4N/K vectors —
    * raised from 3 in r9 when the coarse stage was measured as the
    * BINDING recall ceiling for the PQ leg (at nprobe 3 the true top-3
    * fell outside the probed cells 1/3 of the time; no codebook can
    * recover a candidate the coarse stage never surfaces). At scale
    * keep nprobe/cells ratio in the few-percent range and re-measure
    * recall on a held-out probe set; raising it is a pure
    * compute-for-recall trade, no re-index needed. */
  val IvfNProbeCells = 4

  /** Embedding dimensionality — set by the CORPUS (TESTDATA.md fixes the
    * fixture at 64), not chosen: every vector operator (dot products,
    * centroid math, quantization) reads it so a dimension mismatch fails
    * loudly at one constant. At 100 TB the only sizing consequence is
    * broadcast arithmetic (centroids, probe sets scale linearly in it). */
  val EmbeddingDim = 64

  /** Winnowing fingerprints kept per document (largest-first). Fixture:
    * 512 never truncates (≤ ~200 fps/doc at sf0.1 — the cap is a guard,
    * not a filter, and WinnowSpec pins the no-truncation fact). At scale:
    * size to the corpus' p99 document length / winnow window W; the cap
    * bounds per-doc state in DedupStream and pair-join fan-out, and
    * truncation degrades recall observably (fp_capped metric), never
    * correctness. */
  val WinnowFpCap = 512

  /** LSH hot-bucket guard: buckets larger than this many docs contribute
    * hub-pairs only (member↔min-id), not all-pairs. Fixture: 1024 —
    * never engaged at sf ≤ 0.1 (LshGuardSpec pins both the dormant and
    * the engaged behavior). At scale: size so cap² pairs fit one
    * executor's shuffle partition (~1e4 for 128 MB partitions);
    * boilerplate/spam buckets at web scale WILL engage it, and the
    * `graft_lsh_capped` observe metrics report every engagement. */
  val HotBucketCap = 1024

  /** Product-quantization subspace count (q92): the 64-dim embedding
    * splits into M sub-vectors, each quantized independently — codes are
    * M small ints per vector, the 100 TB ANN MEMORY dial (M·log₂Ks bits
    * per vector: 16×4-bit = 8 B vs 256 float B = 32× compression, the
    * same stored size as the production 8×8-bit shape). Raised 8→16 in
    * r9: on the near-random fixture, 4-dim subspaces at Ks=16 quantize
    * tightly enough that ADC reaches the coarse-stage ceiling (recall@3
    * 0.867 vs 0.600 at M=8, same R, same bytes). At scale M=8..16 with
    * SubDim 4..16 is the standard range; M must divide the embedding
    * dim. Recall is re-measured per corpus (PqSpec pins the floor). */
  val PqSubspaces = 16

  /** Per-subspace PQ codebook size (q92). Fixture: 16 centroids (4-bit
    * codes) keeps the unrolled exact oracle tractable; production
    * standard is 256 (8-bit codes, one byte per subspace). Codebook
    * broadcast is M·Ks·SubDim floats — 256·8·8·4 B = 64 KB at the
    * production shape, still trivially broadcastable. */
  val PqCodebook = 16

  /** PQ re-rank shortlist size (q92): the ADC scan keeps the R best
    * codes per probe and only THOSE R rows fetch their float vectors
    * for exact re-ranking (Jégou et al.'s IVFADC+R) — the float I/O per
    * probe is R rows, not a cell. Fixture: 64 (measured recall@3 0.867
    * with residual codes at M=16/nprobe=4 on the near-random synthetic
    * embeddings — the hardest corpus for PQ; PqSpec pins the 0.6
    * floor). At scale R trades float-fetch I/O for recall — and the r9
    * sf1 probe measured exactly HOW: the PQ gap under its own coarse
    * ceiling widens with CELL size (at sf1's 2,500-vector cells the
    * R=64 shortlist covers 10× less of each cell than at sf0.01, and
    * recall drops with it). So R is no longer a fixed constant: the
    * serve plan computes R(N) = max(PqRerank, ⌈N / [[PqRerankDiv]]⌉)
    * IN-PLAN (a one-row broadcast scalar; the oracle mirrors it with a
    * scalar subquery), holding the shortlist's average-cell coverage
    * ≥ 25% at every corpus size. This floor is the small-corpus value. */
  val PqRerank = 64

  /** The divisor of the adaptive re-rank rule: R(N) = max([[PqRerank]],
    * ⌈N / PqRerankDiv⌉) with PqRerankDiv = [[IvfCells]]·4 — i.e. the
    * shortlist is sized to ≥ 1/4 of the average cell (N/K), the
    * coverage at which the sf0.01 fixture measured ADC reaching its
    * coarse-stage ceiling exactly. Division by a power of two keeps
    * ⌈N/32.0⌉ an EXACT double op on both engines (no rounding
    * divergence in the dial itself). At 1e9 vectors and K re-dialed to
    * √N ≈ 32k cells this yields R ≈ 7.8k — still a per-probe float
    * gather, not a corpus scan. */
  val PqRerankDiv: Int = IvfCells * 4

  /** Scala twin of the in-plan adaptive-R rule (tools + specs; the
    * declared plans compute the same value in-plan). */
  def pqRerankFor(n: Long): Long =
    math.max(PqRerank.toLong, math.ceil(n / PqRerankDiv.toDouble).toLong)

  /** SQ8 shortlist size (q102): the integer-code brute scan keeps the R
    * best codes per probe and only those fetch floats for exact
    * re-ranking — same IVFADC+R shape as [[PqRerank]], different code.
    * SQ8 at 8 bits/dim is far higher-fidelity than PQ (measured
    * recall@3 1.0 on the near-random fixture corpus at R=64, vs PQ's
    * 0.867 — Sq8Spec pins 0.9), so R stays at the small end of the
    * 10-100×-k range; 4× memory (64 B vs 8 B per vector) buys the
    * recall headroom. At scale R follows the same re-measure-per-corpus
    * rule as PqRerank. */
  val SqRerank = 64

  /** Decontamination bloom sizing: bits per filter and the expected
    * distinct-shingle count it is sized for. Fixture: 2^22 bits /
    * 2^16 items ≈ 64 bits/item → fp ≈ 1e-5 at 512 KB per filter.
    * At scale: benchmark suites are SMALL by nature (the bloom carries
    * the benchmark side, never the corpus side), so 2^26 bits covers a
    * 1M-shingle benchmark at the same fp for 8 MB — still one broadcast
    * literal. Exactness never depends on fp: the bloom is a prefilter,
    * an exact join verifies every hit (q81 doctrine). */
  val BloomBits: Long = 1L << 22

  /** See [[BloomBits]] — the expected-items half of the sizing pair. */
  val BloomItems: Long = 1L << 16

  /** Max staged persists [[graft.operators.StagedCache]] keeps live —
    * the owner bound for the inline queries' cached intermediates
    * (training stages, tagged assignments, rank bases, and — since r10 —
    * the cross-query shared builds: minhash signatures/pairs, winnow
    * fingerprints/pairs, the bm25 tf table, overlap shingles). Fixture:
    * 32 covers all staged keys of one full Verify/Bench pass over one
    * fixture dir with LRU headroom (the r10 sharing work brought the
    * distinct-key count to ~20; evicting a shared build between its
    * producer and its consumer query silently re-prices the build, so
    * the cap must exceed the keys-per-pass, not just bound memory —
    * persisted entries spill to disk under pressure anyway). At scale
    * the entries are proportionally larger (a cached assignment is O(N)
    * rows), so size this by executor storage memory: entries × largest-
    * staged-plan must fit the storage fraction, and a serving deployment
    * should prefer the persisted-index path (q86/q93/q96/q99), which
    * stages nothing. */
  val StagedPersistCap = 32

  /** Canary probe stride for the [[graft.streaming.EvalStream]] quality
    * monitor: every stride-th vec_id in the index is recall-graded per
    * tick. Fixture: 100 → 5 probes at sf0.01. At scale hold |probes| =
    * N/stride roughly CONSTANT by raising the stride with the corpus
    * (the exact-truth leg costs |probes|·N scores per tick — the dial
    * bounds eval COST, not fidelity: recall over a fixed stride sample
    * is an unbiased estimate either way, and ~tens of probes already
    * separate healthy from stale in the spec's constructed-drift test). */
  val EvalProbeStride = 100L

  /** Pair-count ceiling for the CC solvers' driver-local fast path
    * ([[graft.operators.Dedup.connectedComponents]]): at or below it the
    * component solve collects the (already-materialized) edge list and
    * runs a sequential union-find instead of the distributed fixpoint —
    * identical labels (component min; spec-pinned), none of the
    * per-round exchange/scheduling constants that are the measured
    * fixture-scale floor (BASELINE §r13: rounds × ~0.4 s of AQE stage
    * scheduling on a 0.33 s DuckDB twin). The same size-adaptivity
    * doctrine as a broadcast join: below the threshold the data is
    * driver-sized and the distributed machinery is pure overhead; above
    * it the pointer-jump fixpoint runs exactly as before (sf30's 30M-pair
    * graph stays distributed). 2^20 pairs ≈ 32 MB collected — well under
    * any sane driver heap, far above every fixture (sf0.1: 43k pairs).
    * At 100 TB the dial matters only for the RESIDUAL contracted graph a
    * future round might route here; the conf
    * (`spark.graft.cc.localMaxPairs`, 0 = always distributed) keeps it
    * A/B-able per session. */
  val LocalCcMaxPairs: Long = 1L << 20

  /** Row floor for [[graft.Tables.rescueNarrowScan]] — the corpus-reader
    * repartition that rescues CPU-dense kernels from few-row-group
    * layouts (a parquet row group is the scan atom; a single-row-group
    * export caps every head stage at ONE task). Below the floor the
    * rescue exchange costs more scheduler time than the kernel it
    * parallelizes, so smoke/gate fixtures keep their plans; above it the
    * spread is worth whole multiples (q94's decode at sf10: 72.6 → 11.3 s
    * the moment the 500k-doc kernel stopped running on one core). At
    * scale the trigger, not this floor, is what matters: a warehouse
    * table with ≥ cores row groups never spreads at any size. */
  val SpreadMinRows = 4096L
}
