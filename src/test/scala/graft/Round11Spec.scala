package graft

import graft.plans.ShuffleMetrics
import graft.queries.DupGraph

/** Round 11: executed shuffle-VOLUME regression guard over the top dedup
  * consumers. The round-10 h61 verify-split win was proven with executed-plan
  * shuffle metrics (records/bytes actually written — the quantity that scales
  * with the corpus; see [[graft.plans.ShuffleMetrics]] for why exchange COUNT
  * is the wrong proxy), but nothing stopped a future edit from silently
  * re-inflating volume. These pins do: each consumer's consumer-side shuffled
  * records are measured at two scale factors and asserted under a ceiling set
  * ~1.5× the measured value — generous enough for plan-choice jitter (AQE,
  * fixture regeneration), tight enough that losing a split/bucket/prune trips
  * it (the h61 un-split alone would add ~37% records).
  *
  * Measurement protocol: [[DupGraph.reset]] before each query so the shared
  * shingle/pair relations rebuild fresh (their lazy checkpoints are separate
  * RDD lineages, so the measured plan is the CONSUMER side — deterministic
  * regardless of suite ordering), and each DataFrame is built fresh (metric
  * accumulators live on plan nodes; re-executing an instance double-counts).
  */
class Round11Spec extends SparkSpec {

  // (query, sfDir, records ceiling) — pinned from measured values in this
  // suite's first run (see info lines), ×1.5 rounded up. The two scale
  // points are sf0.001 (500 docs) and sf0.1 (5,000 docs) — sf0.01's
  // documents table is ALSO 500 rows (the doc fixtures only grow at sf0.1),
  // so it would duplicate the first point, not add a second.
  // Measured 2026-08-14 (records): sf0.001 h5=528 h6=54,894 h16=29,403
  // h61=42,181; sf0.1 h5=5,256 h6=589,892 h16=289,967 h61=412,237 —
  // 10× docs → ~10× records, the linear posture the scale claims make.
  // h61's ceiling is ~1.25× (not 1.5×): the specific regression it guards —
  // reverting the per-branch verify split — measures +25–37% records, so a
  // 1.5× ceiling would let it back in silently. NOT hypothetical: a
  // round-10 commit (65c8158, a stash mishap during the split's own A/B)
  // DID silently revert the split, and the regressed build then measured
  // 56,072/542,829 records here — above these ceilings, which is the
  // point. Caught in round 11 by re-running the 30×matbkt A/B against the
  // archived artifact (exact-digit match with the pre-split signature);
  // the split was restored from b6fb44f and these pins re-measured on it.
  // Record counts are deterministic for a fixed plan + data (write-side
  // totals; AQE coalescing is read-side), so 1.25× is still generous.
  private val pins = Seq(
    ("h5_minhash_lsh_pairs", "/root/testdata/sf0.001", 800L),
    ("h6_ngram_jaccard", "/root/testdata/sf0.001", 83000L),
    ("h16_dedup_corpus_keep", "/root/testdata/sf0.001", 45000L),
    ("h61_incremental_dedup", "/root/testdata/sf0.001", 53000L),
    ("h5_minhash_lsh_pairs", "/root/testdata/sf0.1", 8000L),
    ("h6_ngram_jaccard", "/root/testdata/sf0.1", 885000L),
    ("h16_dedup_corpus_keep", "/root/testdata/sf0.1", 435000L),
    ("h61_incremental_dedup", "/root/testdata/sf0.1", 515000L),
    // the round-11 video query: decode is scan-side mapPartitions, so the
    // ONLY shuffle is the display sort's range exchange over the 7-long
    // stats rows — measured exchanges=1, records=docs count exactly
    // (500/5,000), 64 B/row vs ~1 KB containers: the ceiling pins that the
    // payload column never starts crossing a shuffle
    ("h99_video_decode", "/root/testdata/sf0.001", 750L),
    ("h99_video_decode", "/root/testdata/sf0.1", 7500L),
    // h100 adds the per-frame resample + raw-DIB re-encode before the same
    // stats pass — still scan-side, same single stats-sort exchange
    ("h100_video_resize", "/root/testdata/sf0.001", 750L),
    ("h100_video_resize", "/root/testdata/sf0.1", 7500L),
    // h102 (round 12): the MJPEG decode-vs-expected pass — all JPEG
    // encode/decode work is scan-side mapPartitions, so like h99/h100 the
    // only exchange is the 48 B/row display sort over the verify rows
    ("h102_mjpeg_decode", "/root/testdata/sf0.001", 750L),
    ("h102_mjpeg_decode", "/root/testdata/sf0.1", 7500L),
    // h103 (round 12): token counts ride the scan, so the shuffled rows are
    // the partial-agg emits of the per-source groupBy (≤ sources×partitions)
    // plus the broadcast totals/normalizer rows and the 20-row display sort —
    // corpus-size-INDEPENDENT by construction, which is why one ceiling
    // serves both scale points (measured 62 records at sf0.001 AND sf0.1;
    // ceiling leaves ~1.5× headroom over sources×2 growth)
    ("h103_temperature_mixing", "/root/testdata/sf0.001", 100L),
    ("h103_temperature_mixing", "/root/testdata/sf0.1", 100L),
    // h104 (round 14): margin mining scores |src|·|tgt| candidate pairs but
    // the two-phase WindowGroupLimit forwards ≤ k per vector per partition,
    // so executed shuffle records stay VECTOR-proportional, never
    // pair-proportional — measured 2,246 records at sf0.001 (500 vectors,
    // ~62k scored pairs) and 9,025 at sf0.1 (2,000 vectors, ~1M scored
    // pairs): 4× vectors → 4× records while pairs grew 16×. The ceiling
    // trips if the prune is lost (full pair relation shuffling would be
    // ~25–110× these numbers).
    ("h104_bitext_margin", "/root/testdata/sf0.001", 3400L),
    ("h104_bitext_margin", "/root/testdata/sf0.1", 13600L),
    // h106 (round 14): the two-level prefix scan shuffles ~one row per doc
    // (the bucket-partitioned window exchange) plus the nBuckets-row totals
    // and the sampled display sort — measured 617 records at sf0.001 and
    // 5,259 at sf0.1 (docs-proportional, as the scan decomposition claims);
    // the ceiling trips if the cumsum regresses to a corpus-sized global
    // window funneling everything through one partition twice
    ("h106_pps_sample", "/root/testdata/sf0.001", 950L),
    ("h106_pps_sample", "/root/testdata/sf0.1", 8000L),
    // h107 (round 14): budgetFill's banded scan — same docs-proportional
    // posture as h106 (measured 733 / 5,245 records) with the quality
    // projection riding the scan; same regression target (a global-window
    // cumsum would double-funnel the corpus)
    ("h107_budget_fill", "/root/testdata/sf0.001", 1100L),
    ("h107_budget_fill", "/root/testdata/sf0.1", 7900L),
    // h108 (round 16): the steady-state ANN-fed margin funnel — both IVF
    // probes' WindowGroupLimits forward <= k rows per vector and the margin
    // tail is per-vector-sized, so records stay VECTOR-proportional
    // (measured 1,492 at sf0.001 / 6,050 at sf0.1 — 4x vectors -> 4x
    // records; the index BUILD's shuffles land at build time, not here)
    ("h108_ann_margin_mining", "/root/testdata/sf0.001", 2300L),
    ("h108_ann_margin_mining", "/root/testdata/sf0.1", 9100L),
    // h109 (round 16): the stride-1 anchor relation is corpus-TOKEN-sized
    // and crosses the winner-aggregate exchange once (map-side partial min
    // collapses nothing here — anchors are near-unique), so records are
    // token-proportional BY CONSTRUCTION (measured 21,018 / 201,490 —
    // ~one record per token, the suffix-array input size); the ceiling
    // trips if the island tail or reassembly starts re-shuffling
    // corpus-sized rows a second time
    ("h109_substring_dedup", "/root/testdata/sf0.001", 32000L),
    ("h109_substring_dedup", "/root/testdata/sf0.1", 310000L),
    // h110 (round 16): the staleness profile over the persisted index —
    // ONE kmeansStep (k·dim partial-agg rows) + one assignment-shaped pass
    // whose per-vector argmax combines map-side, so records stay
    // vector-proportional (measured 286 at sf0.001 / 1,007 at sf0.1 for
    // 250 -> 1,000 tgt-side vectors); the ceiling trips if the per-vector
    // aggregate loses its partial or the profile starts re-shuffling cv
    // payloads
    ("h110_ivf_staleness", "/root/testdata/sf0.001", 450L),
    ("h110_ivf_staleness", "/root/testdata/sf0.1", 1600L),
    // h112 (round 17): the repair's MEASURED tail is the component labeling
    // + leaky filter over the CC output (the star rounds and the pair
    // construction execute eagerly inside connectedComponents — separate
    // jobs, like h23's); records are leaky-membership-sized (measured 80 at
    // sf0.001 / 908 at sf0.1), and the ceiling trips if the repair starts
    // re-shuffling the corpus or the pair relation a second time
    ("h112_split_repair", "/root/testdata/sf0.001", 150L),
    ("h112_split_repair", "/root/testdata/sf0.1", 1400L),
    // h113 (round 17): the line relation crosses the df aggregate once
    // (distinct fingerprints, map-side partials) and the doc-keyed
    // reassembly once — line-proportional by construction (measured 5,991
    // at sf0.001 / 58,258 at sf0.1 for ~2.9k/29k wrapped lines); trips if
    // line TEXT starts crossing the df aggregate or reassembly re-shuffles
    ("h113_boilerplate_lines", "/root/testdata/sf0.001", 9000L),
    ("h113_boilerplate_lines", "/root/testdata/sf0.1", 88000L),
    // h114 (round 17): the learning rounds execute eagerly (per-round
    // vocabulary aggregate + 1-row driver argmax, the CC-probe pattern), so
    // the measured plan is just the 8-row merge table's display exchange —
    // the ceiling pins that the loop STAYS eager-vocabulary-sized: if a
    // refactor folded the rounds into the measured plan, the corpus-token
    // aggregate would land here and blow straight past it
    ("h114_bpe_merge_learning", "/root/testdata/sf0.001", 16L),
    ("h114_bpe_merge_learning", "/root/testdata/sf0.1", 16L),
    // h115 (round 18 pin for the round-17 query): the trainer rounds are
    // eager like h114's, so the measured plan is the per-doc fertility
    // aggregate + display sort — exactly 2·docs records (measured 1,000 at
    // sf0.001 / 10,000 at sf0.1 for 500/5,000 docs, 36 B/row: ids and
    // counts only). Trips if the encode starts re-shuffling piece text or
    // a refactor folds the corpus-token aggregate into the measured plan
    ("h115_bpe_fertility", "/root/testdata/sf0.001", 1500L),
    ("h115_bpe_fertility", "/root/testdata/sf0.1", 15000L),
    // h118 (round 19, two-phase range-rank): keyed rows cross the range
    // exchange once, local ranks + the shards-row offsets ride the reused
    // exchange, and the offset join broadcasts — ≈3·docs records total
    // (measured 1,535 at sf0.001 / 15,035 at sf0.1). Trips if the rank
    // regresses to a corpus-sized window exchange or the offsets stop
    // sharing the range exchange
    ("h118_epoch_shuffle", "/root/testdata/sf0.001", 2400L),
    ("h118_epoch_shuffle", "/root/testdata/sf0.1", 23000L),
    // h120 (round 19): packing window + sequence-rank + manifest
    // aggregate — everything past the doc scan is sequence- or
    // shard-sized, so records stay ≈2·docs (measured 1,051 / 9,817).
    // Trips if the doc→order join starts re-shuffling doc text or the
    // manifest aggregate loses its partial step
    ("h120_export_manifest", "/root/testdata/sf0.001", 1600L),
    ("h120_export_manifest", "/root/testdata/sf0.1", 15000L),
    // h121 (round 19): the gradient steps are EAGER (driver-collected
    // model-sized aggregates, the h114/h116 posture), so the measured
    // plan is just the scoring display sort — exactly docs records
    // (measured 500 / 5,000 in ONE exchange). Trips if a refactor folds
    // a training pass into the measured plan
    ("h121_policy_bank", "/root/testdata/sf0.001", 800L),
    ("h121_policy_bank", "/root/testdata/sf0.1", 7500L),
    // h122 (round 20): every stage aggregate is collected DRIVER-SIDE over
    // the stage-boundary checkpoints (the ledger is ten rows), so the
    // MEASURED plan is the literal audit relation + its display sort —
    // ~10 records. Trips if a refactor folds a corpus-sized stage back
    // into the returned plan
    ("h122_curation_pipeline", "/root/testdata/sf0.001", 100L),
    ("h122_curation_pipeline", "/root/testdata/sf0.1", 100L),
    // h123 (round 20): training is eager (the h116/h121 posture); the
    // measured plan is one corpus aggregate collapsed to <= 21 threshold
    // buckets plus threshold-count-sized expansion rows
    ("h123_gate_calibration", "/root/testdata/sf0.001", 400L),
    ("h123_gate_calibration", "/root/testdata/sf0.1", 400L),
    // h124 (round 20): one signature build (16 rows/doc) + 5 banding
    // branches (31 band rows/doc total) + banding-count-sized rollups
    ("h124_lsh_planner", "/root/testdata/sf0.001", 21000L),
    ("h124_lsh_planner", "/root/testdata/sf0.1", 169000L),
    // h125 (round 20): two versioned manifest builds + the shard-count
    // diff join — everything past the two doc scans is sequence- or
    // shard-sized (the h120 law, twice)
    ("h125_incremental_export", "/root/testdata/sf0.001", 4600L),
    ("h125_incremental_export", "/root/testdata/sf0.1", 44000L),
    // h126 (round 20): the solve runs over the DOMAIN relation — one
    // partial-aggregated groupBy(domain) collapses the corpus scan to
    // domains×partitions rows, then windows/broadcasts over ≤ |domains|
    // rows; corpus-size-independent past the first aggregate
    ("h126_epoch_capped_mix", "/root/testdata/sf0.001", 150L),
    ("h126_epoch_capped_mix", "/root/testdata/sf0.1", 150L))

  for ((name, dir, ceiling) <- pins) {
    val sfLabel = dir.split('/').last
    test(s"$name shuffled records within budget at $sfLabel") {
      DupGraph.reset()
      val vol = ShuffleMetrics.measure(SparkEntry.queries(name)(spark, dir))
      info(s"$name@$sfLabel: exchanges=${vol.exchanges} records=${vol.records} bytes=${vol.bytes}")
      // a 0 would mean the metric name broke (e.g. a Spark upgrade renamed
      // shuffleRecordsWritten) — that silently vacates the ceiling, so fail
      assert(vol.records > 0, "no shuffle records measured — metric wiring broken?")
      assert(vol.records <= ceiling,
        s"$name shuffled ${vol.records} records at $sfLabel, ceiling $ceiling — " +
          "a plan change re-inflated shuffle volume (lost split/bucket/prune?)")
    }
  }

  // the round-16 tie-split path (budgetFill bandWidth=1 + tieWidth, the
  // degenerate all-equal-score escape hatch): record volume must stay
  // docs-proportional like h107's — the split changes PARTITIONING (one
  // corpus-band window task → corpus/tieWidth tasks), not volume, so a
  // ceiling trip means the subdivision started duplicating or re-keying
  // rows. Measured 2026-08-15: 516 records at sf0.001, 5,158 at sf0.1
  // (docs-proportional: ~one window row per doc + the (band, sub) totals);
  // ceilings ×1.5 rounded up.
  for ((dir, ceiling) <- Seq(
      ("/root/testdata/sf0.001", 800L), ("/root/testdata/sf0.1", 7800L))) {
    val sfLabel = dir.split('/').last
    test(s"budgetFill tie-split on all-equal scores stays docs-proportional at $sfLabel") {
      import org.apache.spark.sql.functions.{col, lit, size}
      val out = graft.extensions.Splits.budgetFill(
        graft.Tables.documents(spark, dir), "doc_id",
        size(graft.extensions.TextOps.tokens(col("text"))), lit(0.5),
        budget = Long.MaxValue / 4, bandWidth = 1, tieWidth = 64L)
      val vol = ShuffleMetrics.measure(out)
      info(s"tiesplit@$sfLabel: exchanges=${vol.exchanges} records=${vol.records} bytes=${vol.bytes}")
      assert(vol.records > 0, "no shuffle records measured — metric wiring broken?")
      assert(vol.records <= ceiling,
        s"tie-split budgetFill shuffled ${vol.records} records at $sfLabel, " +
          s"ceiling $ceiling — the subdivision must change partitioning, not volume")
    }
  }

  // h117 (round 19, feature-hashed): the NB model is bounded at
  // |langs| × nBuckets rows BY CONSTRUCTION — independent of charset /
  // vocabulary, the property whose absence made the r18 raw-trigram model
  // weak. Pinned on a corpus whose distinct-trigram vocabulary EXCEEDS the
  // bucket space (so the ceiling binds), through the operator's own
  // hashing expression (nbDocBuckets — a test-side re-derivation could
  // drift from what the operator scores with).
  test("nbLangId hashed model: bounded by langs x nBuckets independent of vocabulary") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nb = 32
    // 300 docs / 3 langs; text = the doc id's md5 hex (wide trigram space)
    val docs = spark.range(300)
      .select(col("id").as("doc_id"),
        concat_ws(" ", md5(col("id").cast("string")),
          md5((col("id") + 1000).cast("string"))).as("text"),
        concat(lit("lang"), (col("id") % 3).cast("string")).as("lang"))
    val vocab = docs
      .select(explode(transform(
        sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3)))).as("tri"))
      .agg(count_distinct(col("tri"))).head().getLong(0)
    assert(vocab > 3L * nb,
      s"fixture too narrow: $vocab distinct trigrams vs ceiling ${3 * nb}")
    val db = graft.extensions.TextAnalysis.nbDocBuckets(
      docs, "doc_id", "text", "lang", nb)
    val Array(bMin, bMax) = db.agg(min(col("b")), max(col("b")))
      .head().toSeq.map(_.asInstanceOf[Int].toLong).toArray
    assert(bMin >= 0L && bMax < nb.toLong,
      s"bucket range [$bMin, $bMax] escaped [0, $nb)")
    val modelCells = db.select(col("lang_true"), col("b")).distinct().count()
    info(s"nb model: vocab=$vocab cells=$modelCells ceiling=${3 * nb}")
    assert(modelCells <= 3L * nb,
      s"model has $modelCells cells over ceiling ${3 * nb} — hashing lost")
    // the hashed operator still scores every doc exactly once, identically
    // under repartitioning (the histogram aggregate is an exact integer sum)
    val a = graft.extensions.TextAnalysis.nbLangId(
      docs, "doc_id", "text", "lang", nb).orderBy("doc_id").collect().toSeq
    val b = graft.extensions.TextAnalysis.nbLangId(
      docs.repartition(7), "doc_id", "text", "lang", nb)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    assert(a.size === 300)
  }
}
