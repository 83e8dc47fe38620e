package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. (The reference's only dedup is
  * the latent `drop_duplicates` at `data_processing.py:342-345`; these are
  * the north-star extensions.)
  *
  * 100 TB posture:
  *   - exact dedup = hash-groupBy: one shuffle on the 128-bit fingerprint,
  *     perfectly balanced (hash keys are uniform).
  *   - MinHash+LSH: signatures are computed scan-side (codegen, no shuffle);
  *     only (band, bucket-hash) pairs shuffle — 4 rows of a few bytes per
  *     document instead of all O(n²) comparisons; the bucket self-join only
  *     compares colliding candidates.
  *   - SimHash: one 16-bit signature per doc scan-side; near-dup = equal
  *     signature (or small Hamming distance via banding, same LSH trick).
  */
object Dedup {

  /** Exact dedup by content fingerprint (md5 of whitespace-normalized
    * lowercase text): one representative (min id) + multiplicity per group.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(TextOps.normalized(col(textCol))).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Bag-of-words dedup: order-INSENSITIVE exact duplicate detection. The
    * fingerprint is md5 over the SORTED token multiset, so shuffled or
    * re-templated copies of a document (same words, different order — a
    * class [[exactGroups]]' order-sensitive fingerprint misses entirely)
    * collide, while any word added, dropped, or repeated a different number
    * of times separates them. Output is the full corpus disposition: every
    * doc, its bag fingerprint, cluster size, kept = lowest-id-wins.
    *
    * Shape (identical scale posture to h1): the sort + join + md5 is one
    * codegen projection over the scan — per-document work, no shuffle;
    * `array_sort` on a ~100-token array is trivial next to the regex
    * tokenize already paid. Cluster stats are one hash-groupBy on the
    * uniform 128-bit fingerprint (partial agg map-side, balanced shuffle),
    * and the disposition join back is co-partitioned on the same key, so
    * the whole operator costs one balanced shuffle at 100 TB. NULL text →
    * NULL md5 → the fingerprint coalesces to a `__null_text__` sentinel, so
    * NULL-text docs survive the equi-join and form one cluster of their own
    * — the disposition is genuinely total (no token sequence md5-hex-encodes
    * to the sentinel, so it cannot collide with a real fingerprint).
    */
  def bagDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = docs.select(col(idCol).as("doc_id"),
      coalesce(md5(array_join(array_sort(TextOps.tokens(col(textCol))), " ")),
        lit("__null_text__"))
        .as("bag_fp"))
    val clusters = fp.groupBy("bag_fp")
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("keeper"))
    fp.join(clusters, "bag_fp")
      .select(col("doc_id"), col("bag_fp"), col("cluster_size"),
        (col("doc_id") === col("keeper")).as("kept"))
  }

  /** The exploded 3-gram shingle relation (`idCol`[, carried cols],
    * `shingle`) every shingle-based construction starts from — tokenize +
    * shingle + explode, pure scan-side codegen work with zero shuffle. In a
    * production pipeline this is the table you MATERIALIZE once per corpus
    * (it is the most expensive shared prefix of the MinHash signature pass
    * and the exact-Jaccard verify, both of which re-run the regex tokenizer
    * if built from raw text) — [[graft.queries.DupGraph.shingleRows]] does
    * exactly that for the declared queries under Bench's opt-in. Docs with
    * <3 tokens produce no rows (no shingle is defined for them), matching
    * the monolithic forms.
    */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame =
    docs.select(col(idCol) +: carryCols.map(col) :+
      explode(TextOps.shingles3(TextOps.tokens(col(textCol)))).as("shingle"): _*)

  /** MinHash signatures: `numHashes` min-hash values per doc from 3-gram
    * word shingles. Docs with <3 tokens have no shingles and are excluded
    * (no signature is defined for them). Delegates to
    * [[minhashSignaturesFromTokens]] (the per-row native form), so the
    * monolithic and tokenized-relation paths cannot drift.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16): DataFrame =
    minhashSignaturesFromTokens(
      docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks")),
      idCol, "__toks", numHashes)

  /** [[minhashSignatures]] from an already-TOKENIZED relation (`idCol`,
    * `toksCol` [, others — ignored]) — the round-22 hot path: the whole
    * signature is ONE per-row call of the native codegen
    * [[graft.functions.MinHashSignature]] in the scan, split into the
    * `mh0..mhN` columns consumers band over. No exchange, no sort — the
    * aggregate form below is a SortAggregate (min over strings has no
    * fixed-width mutable buffer, so Spark cannot hash-aggregate it): it
    * sorted the corpus-shingle relation on both sides of a full exchange
    * per consumer. Docs with <3 tokens (no shingle defined) return a null
    * signature and are filtered — exactly the rows the aggregate form
    * never produced. Round22Spec pins the equality.
    */
  def minhashSignaturesFromTokens(tokens: DataFrame, idCol: String,
      toksCol: String, numHashes: Int = 16): DataFrame = {
    val sig = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.MinHashSignature(
        org.apache.spark.sql.GraftColumnBridge.expression(col(toksCol)),
        numHashes))
    tokens
      .select(col(idCol), sig.as("__sig"))
      .filter(col("__sig").isNotNull)
      .select(col(idCol) +:
        (0 until numHashes).map(k =>
          element_at(col("__sig"), k + 1).as(s"mh$k")): _*)
  }

  /** [[minhashSignatures]] from an ALREADY-BUILT shingle relation
    * (`idCol`, `shingle` [, others — ignored]) — the aggregate
    * formulation, kept as the reference the per-row native form is pinned
    * against (Round8/Round22Spec) and for callers that hold ONLY a shingle
    * relation: hash each shingle `numHashes` ways in one projection, then
    * `groupBy(doc).agg(min...)` (map-side partial, 16 values per doc per
    * partition — but a SortAggregate, see [[minhashSignaturesFromTokens]]).
    */
  def minhashSignaturesFromShingles(rows: DataFrame, idCol: String,
      numHashes: Int = 16): DataFrame = {
    val mins = (0 until numHashes).map(k =>
      min(md5(concat(lit(s"$k:"), col("shingle")))).as(s"mh$k"))
    rows.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: hash `rowsPerBand` consecutive signature values per band;
    * docs sharing any (band, hash) bucket become candidate pairs.
    * Band rows come from ONE posexplode projection over the aggregated
    * signatures (not a bands-way union, which would re-run the signature
    * subplan per branch).
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame =
    lshCandidatePairsFromTokens(
      docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks")),
      idCol, "__toks", numHashes, bands)

  /** The LSH band rows `(id, band, bucket)` of a signature relation — the
    * shared banding projection of every candidate-pair construction. */
  private def bandRowsOf(sig: DataFrame, idCol: String, numHashes: Int,
      bands: Int): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes); " +
        "otherwise trailing signature values are silently ignored")
    val rowsPerBand = numHashes / bands
    val bucketCols = (0 until bands).map { b =>
      md5(concat((0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*))
    }
    sig.select(col(idCol), posexplode(array(bucketCols: _*)))
      .toDF("id", "band", "bucket")
  }

  /** Self-join of a band-row relation into candidate pairs (id_a < id_b,
    * distinct across bands). */
  private def bandSelfJoinPairs(bandRows: DataFrame): DataFrame = {
    val a = bandRows.toDF("id_a", "band", "bucket")
    val b = bandRows.toDF("id_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** [[lshCandidatePairs]] from an already-TOKENIZED relation (the round-22
    * hot path — native per-row signatures, see
    * [[minhashSignaturesFromTokens]]). The band rows are localCheckpoint'd
    * (4 small rows per doc) so the self-join's two sides read one
    * materialization instead of each re-hashing every shingle numHashes
    * ways.
    */
  def lshCandidatePairsFromTokens(tokens: DataFrame, idCol: String,
      toksCol: String, numHashes: Int = 16, bands: Int = 4): DataFrame =
    bandSelfJoinPairs(
      bandRowsOf(minhashSignaturesFromTokens(tokens, idCol, toksCol, numHashes),
        idCol, numHashes, bands)
        .localCheckpoint(eager = false))

  /** [[lshCandidatePairs]] from an already-built shingle relation — the
    * aggregate-signature reference form (see
    * [[minhashSignaturesFromShingles]]; Round8Spec pins it against the
    * direct path).
    */
  def lshCandidatePairsFromShingles(rows: DataFrame, idCol: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame =
    bandSelfJoinPairs(
      bandRowsOf(minhashSignaturesFromShingles(rows, idCol, numHashes),
        idCol, numHashes, bands))

  /** LSH PARAMETER PLANNER (h124) — the read-before-deciding profile a
    * 100 TB dedup run consults BEFORE committing to a banding: for every
    * candidate `(bands, rowsPerBand)` factorization of the `numHashes`
    * MinHash signature, the EMPIRICAL candidate-pair volume the bucket
    * join would materialize (Σ over (band, bucket) cells of C(n,2) — the
    * verify-stage work, counted per colliding cell exactly as the join
    * produces it, before the cross-band distinct) next to the THEORETICAL
    * recall of the banding at the verify threshold θ = 1/2 (the h16/h112
    * operating point): `P(candidate | J = θ) = 1 − (1 − θ^r)^b`. More rows
    * per band → fewer, cheaper candidates but lower recall; the planner
    * emits the whole trade so the operator (or its operator) picks the
    * cheapest banding whose recall clears the pipeline's floor.
    *
    * Determinism: the recall is EXACT integer math — θ = 1/2 makes
    * `(1 − 2^−r)^b = (2^r − 1)^b / 2^(r·b)` a ratio of exact integers
    * (r·b = numHashes ≤ 30 keeps everything in long range), and
    * `recall_q = floor(num·10⁶/2^numHashes + 1/2)` is one integer
    * division — no `pow` whose last ulp an engine could disagree on.
    *
    * 100 TB posture: signatures are computed ONCE
    * ([[minhashSignaturesFromShingles]] over the shared shingle relation —
    * the [[graft.queries.DupGraph]] materialize-once posture) and
    * checkpointed so the per-banding branches share the build instead of
    * re-scanning the corpus per factorization; each branch is one
    * posexplode projection (b rows/doc), the cell count is one balanced
    * hash aggregate keyed by (r, band, bucket), and the roll-up is
    * banding-count-sized. Total cost ≈ Σ_configs b rows per doc =
    * σ(numHashes)-ish doc-sized rows — far below the candidate join any
    * single MIS-chosen banding would pay.
    *
    * Output: `bands:int, rows_per_band:int, n_buckets, n_hot_buckets
    * (cells with ≥ 2 docs), cand_pairs, recall_q` — one row per banding.
    */
  def lshPlan(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16): DataFrame =
    lshPlanFromTokens(
      docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks")),
      idCol, "__toks", numHashes)

  /** [[lshPlan]] from an already-TOKENIZED relation (the round-22 hot
    * path — native per-row signatures, see [[minhashSignaturesFromTokens]];
    * the aggregate-signature form this replaces paid a SortAggregate over
    * the exploded shingle relation before the per-banding branches).
    */
  def lshPlanFromTokens(tokens: DataFrame, idCol: String, toksCol: String,
      numHashes: Int = 16): DataFrame = {
    require(numHashes >= 1 && numHashes <= 30,
      s"recall math stays in long range for numHashes <= 30, got $numHashes")
    val configs = (1 to numHashes).filter(numHashes % _ == 0)
    val sig = minhashSignaturesFromTokens(tokens, idCol, toksCol, numHashes)
      .localCheckpoint(eager = false)
    val branches = configs.map { r =>
      val b = numHashes / r
      val bucketCols = (0 until b).map { band =>
        md5(concat((0 until r).map(i => col(s"mh${band * r + i}")): _*))
      }
      sig.select(lit(r).as("rows_per_band"),
          posexplode(array(bucketCols: _*)))
        .toDF("rows_per_band", "band", "bucket")
    }
    val stats = branches.reduce(_ unionByName _)
      .groupBy("rows_per_band", "band", "bucket")
      .agg(count(lit(1)).as("n"))
      .groupBy("rows_per_band")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("n_hot_buckets"),
        sum(expr("(n * (n - 1)) div 2")).as("cand_pairs"))
    // exact rational recall at theta = 1/2, computed driver-side over the
    // banding enumeration (parameter math, not data math): BigInt keeps the
    // intermediate power exact, the result fits a long by the require above
    val den = BigInt(2).pow(numHashes)
    val rec = configs.map { r =>
      val b = numHashes / r
      val num = den - (BigInt(2).pow(r) - 1).pow(b)
      (b, r, ((num * 1000000 + den / 2) / den).toLong)
    }
    val sp = tokens.sparkSession
    import sp.implicits._
    stats
      .join(broadcast(rec.toDF("bands", "rows_per_band", "recall_q")),
        "rows_per_band")
      .select("bands", "rows_per_band", "n_buckets", "n_hot_buckets",
        "cand_pairs", "recall_q")
  }

  /** 16-bit SimHash signature per document (near-dup docs get equal or
    * near-equal signatures; weighted by token multiplicity).
    *
    * Shape: a SimHash is per-document, so it is computed inside the row by
    * the native codegen'd [[graft.functions.SimHashLong]] — zero exchanges
    * (see [[simhashLongs]]; this string surface derives from the same
    * expression, keeping ONE copy of the vote formula on the Spark side).
    */
  def simhashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashesN(docs, idCol, textCol, 16)

  /** `bits`-bit SimHash signatures (votes from the first `bits` hex nibbles
    * of each token's md5; md5 supplies up to 32). [[simhashes]] pins the
    * 16-bit h7 surface; the near-dup pairing below uses 32 bits — on a
    * topically uniform corpus most of a short signature is determined by
    * the global token distribution, so extra bits are what separate
    * documents (measured on the fixture: 500 docs → 292 distinct 16-bit
    * sigs with 17k hamming≤2 pairs, but 475 distinct 32-bit sigs with
    * 1.3k pairs).
    */
  def simhashesN(docs: DataFrame, idCol: String, textCol: String,
      bits: Int): DataFrame =
    simhashLongs(docs, idCol, textCol, bits)
      .select(col(idCol), lpad(bin(col("sig")), bits, "0").as("simhash"))

  /** `bits`-bit SimHash signature as a LONG (bit `j` of [[simhashesN]]'s
    * string ↔ weight `2^(bits−j)`): integer form makes banding a
    * shift-and-mask and Hamming distance a single `bit_count(xor)` — one
    * codegen'd ALU op per candidate pair instead of `bits` substring
    * comparisons, and the identical integer expressions run in any engine.
    *
    * Scale shape: computed inside the row by the native codegen'd
    * [[graft.functions.SimHashLong]] — ZERO exchanges at any corpus size.
    * (The previous formulation exploded (doc, token) rows and summed
    * `bits` CASE columns through a two-level hash aggregate — a
    * corpus-token-sized shuffle every consumer of the SimHash family paid;
    * before that, a column-per-bit HOF formulation re-hashed every token
    * `bits`× interpreted — 25× slower still. Equality across all three
    * generations is pinned by Round4Spec's pigeonhole-recall and
    * string↔integer consistency tests plus the h7/h41 oracles.) Docs with
    * no tokens have no signature — filtered here, mirroring the
    * explode+aggregate form where they produced no output group.
    */
  def simhashLongs(docs: DataFrame, idCol: String, textCol: String,
      bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 32, "md5 supplies at most 32 hex nibbles")
    val sig = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SimHashLong(
        org.apache.spark.sql.GraftColumnBridge.expression(
          TextOps.tokens(col(textCol))), bits))
    docs.select(col(idCol), sig.as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** SimHash near-dup candidate pairs: band the `sigBits`-bit signature
    * into `bands` equal slices, bucket-join on (band, slice), verify
    * candidates by exact Hamming distance ≤ `maxHamming`. Two signatures
    * within Hamming distance `bands − 1` ALWAYS share at least one
    * identical band (pigeonhole), so recall is exact for
    * `maxHamming < bands` — banding is pure pruning, not approximation.
    *
    * Scale shape: like [[lshCandidatePairs]], only (id, band, slice) rows
    * shuffle; pairs materialize per bucket, never all-pairs. The Hamming
    * verify — `bit_count(sig_a XOR sig_b)`, one codegen'd ALU op — runs on
    * the JOIN STREAM before any distinct, so the only wide shuffle carries
    * verified near-dup pairs. (The first formulation — 4-bit band keys,
    * 32-term per-character Hamming, distinct before verify — ground
    * through a 34M-row candidate stream for 65 s at sf0.1; this one holds
    * 7.5M candidates and runs in ~2 s.) Band width trades bucket entropy
    * against recall bound: width 8 / 4 bands covers hamming ≤ 3 with
    * 256-way keys per band.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 2, bands: Int = 4, sigBits: Int = 32): DataFrame = {
    require(sigBits % bands == 0, "bands must divide the signature width")
    require(maxHamming < bands,
      "exact recall needs maxHamming < bands (pigeonhole)")
    val w = sigBits / bands
    val mask = (1L << w) - 1
    // simhashLongs is scan-side; the repartition is a materialization
    // barrier so the self-join's two sides share ONE signature build via
    // exchange reuse (without it each side re-runs the md5 scan pipeline).
    // Doc-sized rows — strictly cheaper than the token-sized aggregate
    // exchange the old explode+agg signature build paid here.
    val sigs = simhashLongs(docs, idCol, textCol, sigBits)
      .repartition(col(idCol))
    val bk = sigs.select(col(idCol).as("__id"), col("sig").as("__sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("sig"), b * w).bitwiseAND(lit(mask))).as("key"))): _*))
        .as("__bk"))
      .select(col("__id"), col("__sig"),
        col("__bk.band").as("band"), col("__bk.key").as("key"))
    val a = bk.select(col("__id").as("id_a"), col("__sig").as("sig_a"),
      col("band"), col("key"))
    val b = bk.select(col("__id").as("id_b"), col("__sig").as("sig_b"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming").distinct()
  }

  /** Exact n-gram (3-shingle) Jaccard similarity for candidate pairs within
    * a blocking key (e.g. same source) — the verify stage after LSH, or a
    * standalone exact near-dup pass when a cheap blocking key exists.
    * Returned similarity is rounded to 4dp for cross-engine stability.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, minJaccard: Double): DataFrame =
    ngramJaccardPairsFromShingles(
      shingleRows(docs, idCol, textCol, carryCols = Seq(blockCol)),
      idCol, blockCol, minJaccard)

  /** [[ngramJaccardPairs]] from an already-built shingle relation
    * (`idCol`, `blockCol`, `shingle`) — the h6 surface over a materialized
    * shingle table (see [[shingleRows]]).
    */
  def ngramJaccardPairsFromShingles(rows: DataFrame, idCol: String,
      blockCol: String, minJaccard: Double): DataFrame = {
    // Distinct (doc, shingle) rows — relational set representation. Shingles
    // are folded to 64-bit xxhash64 keys before the shuffle: set sizes and
    // intersections are identical (modulo 2^-64 collisions) while the
    // distinct + self-join shuffle moves 8-byte longs instead of ~20-byte
    // strings. The single physical exchange below `ds` is shared by all
    // three consumers (sizes + both join sides) via ReuseExchange.
    val ds = rows
      .select(col(idCol).as("doc"), col(blockCol).as("blk"),
        xxhash64(col("shingle")).as("shingle"))
      .distinct()
    val sizes = ds.groupBy("doc").agg(count(lit(1)).as("n"))
    val inter = ds.toDF("doc_a", "blk", "shingle")
      .join(ds.toDF("doc_b", "blk", "shingle"), Seq("blk", "shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        Det.floorRound(col("i") / (col("na") + col("nb") - col("i")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** End-to-end corpus dedup pass — the composition an LLM-data pipeline
    * actually runs: (1) exact-dup groups collapse to their min-id
    * representative; (2) MinHash+LSH proposes candidate near-dup pairs among
    * the survivors; (3) candidates are VERIFIED with exact shingle-set
    * Jaccard (only candidate pairs pay the verify cost); (4) greedy keep
    * policy drops the larger id of every verified pair (deterministic,
    * one-pass; [[dedupClusters]] is the full transitive-clustering
    * alternative built on [[connectedComponents]]). Returns the kept doc ids.
    *
    * 100 TB shape: the `reps` survivor set feeds three consumers (signature
    * pass, verify-stage shingle set, final keep-list), so without reuse the
    * corpus is scanned and fingerprinted once per consumer and tokenized
    * twice. Pass `persistIntermediate = true` to persist `reps` (and the
    * distinct shingle set) across those consumers — at real scale you would
    * instead materialize `reps` to a bucketed table between stages. The
    * LSH bucket join itself is tiny ((id, bucket) pairs), and the verify
    * join touches only candidate pairs' shingle rows.
    */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5, numHashes: Int = 16, bands: Int = 4,
      persistIntermediate: Boolean = false): DataFrame = {
    // (1) exact collapse. Caller owns the cache lifecycle: persisted handles
    // stay cached until the session ends (or spark.catalog.clearCache());
    // appropriate for a one-shot dedup job, not for a long-lived session.
    val reps0 = exactReps(docs, idCol, textCol)
    val reps = if (persistIntermediate) reps0.persist() else reps0
    // (2)+(3) LSH candidates among representatives, exact-Jaccard verified
    val verified = verifiedNearDupPairs(reps, idCol, textCol, minJaccard,
      numHashes, bands, persistShingles = persistIntermediate)
    dedupCorpusFromPairs(reps, verified, idCol)
  }

  /** Step 4 of [[dedupCorpus]] as standalone API: the greedy keep-list from
    * an ALREADY-MATERIALIZED verified-pair table (id_a < id_b). This is the
    * production decomposition the [[dedupCorpus]]/[[incrementalDedup]]
    * scaladocs describe — signatures and verified pairs materialized once
    * per run into tables, every downstream consumer (keep-list, clusters,
    * graph analytics) reading them — made callable directly.
    */
  def dedupCorpusFromPairs(reps: DataFrame, verifiedPairs: DataFrame,
      idCol: String): DataFrame =
    reps.select(col(idCol))
      .join(verifiedPairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")

  /** [[dedupClusters]]' clustering stage from an already-materialized
    * verified-pair table — see [[dedupCorpusFromPairs]].
    */
  def dedupClustersFromPairs(verifiedPairs: DataFrame, idCol: String): DataFrame =
    connectedComponents(verifiedPairs, "id_a", "id_b")
      .select(col("id").as(idCol), col("comp").as("cluster_rep"))

  /** Incremental dedup — the daily-ingest companion to [[dedupCorpus]]:
    * admit only those `incoming` docs that are neither exact nor verified
    * near-duplicates of the `existing` corpus or of an earlier (lower-id)
    * incoming doc. The existing corpus is NEVER re-deduped — that is the
    * point: a cron-cadence pipeline (the reference deploys daily,
    * `/root/reference/flows.py:388-399`) dedups each new batch against the
    * accumulated corpus, not the corpus against itself.
    *
    * Precedence is (existing, then incoming by ascending id): an incoming
    * doc is dropped iff it exact-matches anything existing / any lower-id
    * incoming doc, or it has an LSH-candidate pair with verified Jaccard ≥
    * `minJaccard` against an existing doc or a lower-id incoming
    * representative — [[dedupCorpus]]'s greedy rule with the whole existing
    * corpus ranked ahead of every incoming doc. Ids must be unique across
    * both inputs.
    *
    * 100 TB posture: the incoming batch is small relative to the corpus, so
    * the only corpus-sized work is scan-side (fingerprints + signatures +
    * shingle sets); in production those are MATERIALIZED once per run into
    * signature/fingerprint tables bucketed by (band, bucket) and reused —
    * the bucket join then touches only buckets the new batch occupies, and
    * the Jaccard verify touches only candidate pairs' shingle rows (cost ∝
    * batch size, never corpus size). That decomposition is now the real
    * implementation: this method just builds [[corpusIndex]] inline and
    * delegates to [[incrementalDedupFromIndex]] — callers that own a
    * materialized index (see [[graft.queries.DupGraph.h61CorpusIndex]])
    * call the latter directly and skip every corpus-sized recomputation.
    *
    * Output: admitted incoming doc ids.
    */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame, idCol: String,
      textCol: String, minJaccard: Double = 0.5, numHashes: Int = 16,
      bands: Int = 4): DataFrame =
    incrementalDedupFromIndex(
      corpusIndex(existing, idCol, textCol, numHashes, bands),
      incoming, idCol, textCol, minJaccard, numHashes, bands)

  /** The existing-corpus side tables of [[incrementalDedup]] — exactly the
    * three relations a production pipeline MATERIALIZES once per corpus
    * (bucketed by their join keys) and reuses across every daily batch:
    *   - `fingerprints`: distinct normalized-content md5s (exact layer);
    *   - `bandRows`: (id, band, bucket) LSH band rows of the MinHash
    *     signatures (candidate generation);
    *   - `shingles`: distinct (doc, xxhash64(shingle)) rows (exact-Jaccard
    *     verify);
    *   - `sizes`: per-doc distinct-shingle counts (the Jaccard denominator
    *     — derivable from `shingles`, carried so the steady-state run pays
    *     no corpus-sized groupBy).
    * All are per-doc constructions, so building them for the corpus and the
    * batch separately is row-identical to building them over the union —
    * which is why [[incrementalDedup]] simply delegates here.
    */
  final case class CorpusIndex(fingerprints: DataFrame, bandRows: DataFrame,
      shingles: DataFrame, sizes: DataFrame)

  /** Build [[CorpusIndex]] for `existing` — one corpus scan feeding three
    * scan-side constructions (normalize+md5, MinHash banding, shingle
    * hashing); each output is ∝ corpus size with bounded row width.
    */
  def corpusIndex(existing: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4): CorpusIndex =
    corpusIndexFromTokens(existing,
      existing.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks")),
      idCol, "__toks", textCol, numHashes, bands)

  /** [[corpusIndex]] over an ALREADY-TOKENIZED relation (`idCol`,
    * `toksCol` [, others — ignored]) — the tokenize pass is the shared
    * prefix of the MinHash banding AND the verify shingle table, so a
    * caller holding a materialized token table (see
    * [[graft.queries.DupGraph.h61CorpusIndex]]) builds both index sides
    * from it without re-tokenizing the corpus per table; signatures are
    * the per-row native form ([[minhashSignaturesFromTokens]]), so the
    * band-row build pays no aggregate exchange at all. The convenience
    * form above delegates here, so the two cannot drift.
    */
  def corpusIndexFromTokens(existing: DataFrame, tokens: DataFrame,
      idCol: String, toksCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4): CorpusIndex = {
    val fp = existing
      .select(md5(TextOps.normalized(col(textCol))).as("__fp")).distinct()
    val bandRows = bandRowsOf(
      minhashSignaturesFromTokens(tokens, idCol, toksCol, numHashes),
      idCol, numHashes, bands)
    val sh = tokens
      .select(col(idCol).as("doc"),
        explode(TextOps.shingles3(col(toksCol))).as("sh"))
      .select(col("doc"), xxhash64(col("sh")).as("sh"))
      .distinct()
    CorpusIndex(fp, bandRows, sh, sh.groupBy("doc").agg(count(lit(1)).as("n")))
  }

  /** [[incrementalDedup]] against an ALREADY-MATERIALIZED [[CorpusIndex]] —
    * the steady-state shape of the daily run: every corpus-sized input is a
    * table read, all per-run work (batch fingerprints/signatures/shingles,
    * bucket join, candidate verify) is ∝ batch size. `numHashes`/`bands`
    * must match the values the index was built with (band-row shape).
    */
  def incrementalDedupFromIndex(index: CorpusIndex, incoming: DataFrame,
      idCol: String, textCol: String, minJaccard: Double = 0.5,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must evenly divide numHashes ($numHashes)")
    // (1) exact layer: within-batch collapse (X1 groupBy-min), then drop
    // batch reps whose content fingerprint already exists in the corpus
    // `fresh` feeds THREE plan branches (signatures, shingles, the final
    // anti-join) — localCheckpoint so the exact-collapse + corpus anti-join
    // run once, not per branch. Batch-sized rows; same lifecycle note as
    // Graph.triangleStats.
    val inReps = exactReps(incoming, idCol, textCol)
    val fresh = inReps
      .withColumn("__fp", md5(TextOps.normalized(col(textCol))))
      .join(index.fingerprints, Seq("__fp"), "left_anti")
      .drop("__fp")
      .localCheckpoint(false)
    // (2) near-dup layer: corpus docs dominate every fresh doc sharing a
    // band bucket, and within the batch the lower id dominates — the same
    // (ord, id) domination order as the retired union self-join, SPLIT into
    // corpus⋈batch ∪ batch⋈batch (round 9) so the corpus-sized relation is
    // joined ONCE against the batch-sized one instead of riding both sides
    // of a union self-join: band-join shuffle volume C+3B instead of
    // 2C+2B rows (C = corpus band rows, B ∝ batch), and a corpus table
    // bucketed by `bucket` joins with NO corpus-side exchange at all
    // (HashPartitioning(bucket) satisfies the (band, bucket) clustering).
    // Equality to the union form holds because corpus/batch ids are
    // disjoint (the documented id-uniqueness contract): every union pair
    // with ord_a=0 is a corpus⋈batch pair, every (1,id_a)<(1,id_b) pair is
    // a batch pair with id_a<id_b.
    // ONE tokenize pass over the batch feeds BOTH the MinHash banding
    // (per-row native signatures — minhashSignaturesFromTokens) and the
    // verify shingle set (round 22, the verifiedNearDupScores posture):
    // the pre-round-22 form re-ran the regex tokenizer + shingle zip once
    // per consumer and aggregated signatures through a SortAggregate.
    // Batch-sized rows.
    val freshToks = fresh
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .localCheckpoint(false)
    // three consumers (corpus join + both sides of the batch self-join);
    // checkpoint so the 16-hash MinHash banding runs once — (id, band,
    // bucket) rows, 4 per batch doc
    val batchRows = bandRowsOf(
        minhashSignaturesFromTokens(freshToks, idCol, "__toks", numHashes),
        idCol, numHashes, bands)
      .localCheckpoint(false)
    val candCorpus = index.bandRows
      .select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(batchRows.select(col("id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
    val candBatch = batchRows
      .select(col("id").as("id_a"), col("band"), col("bucket"))
      .join(batchRows.select(col("id").as("id_b"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
    // (3) exact-Jaccard verify on candidates only (the h6/h16 shape),
    // run PER BRANCH (round 10): the old form union'd the two candidate
    // streams and union'd index.shingles/index.sizes with the batch
    // relations before one shared verify chain — and UNION destroys a
    // bucketed table's HashPartitioning, so the CORPUS-sized shingle
    // relation re-exchanged on every run even when materialized bucketed
    // by doc. Verifying each branch against exactly the relations its
    // id_a side can match (ids are disjoint across corpus and batch, so a
    // corpus-pair id_a joins only corpus shingles and a batch-pair id_a
    // only batch shingles — row-identical to the union form) keeps
    // index.shingles/index.sizes OUT of any union: a doc-bucketed corpus
    // table feeds its verify join with no corpus-side exchange, and the
    // only union left carries the per-branch DOMINATED id sets —
    // batch-id-sized, the cheapest relation in the query. Measured
    // (BASELINE.md round-10 row): 30×matbkt h61 10.7→9.6 s — note the
    // exchange COUNT rises 15→22 (the duplicated chains add PAIR-sized
    // shuffles) while the removed exchange carried the corpus-sized
    // shingle relation, which is why wall-clock improves and the gap
    // widens at 100×matbkt (25.1→23.5 s in a 1.3–1.9× slower window).
    // The dominated side (id_b) is ALWAYS a fresh-batch doc, so its
    // shingle and size joins ride the batch-sized relations in both
    // branches (round 9). freshSh has four consumers (both branches' id_b
    // joins, the batch branch's id_a join, freshSizes) — checkpoint so the
    // batch shingle explode + distinct runs once.
    val freshSh = freshToks
      .select(col(idCol).as("doc"),
        explode(TextOps.shingles3(col("__toks"))).as("sh"))
      .select(col("doc"), xxhash64(col("sh")).as("sh"))
      .distinct()
      .localCheckpoint(false)
    val freshSizes = freshSh.groupBy("doc").agg(count(lit(1)).as("n"))
    // per-branch candidate dedup: the branches partition the old union's
    // pair set (corpus ids ≠ batch ids), so branch-wise distinct ∪ is the
    // union's distinct
    def dominatedBy(cand: DataFrame, aSh: DataFrame, aSizes: DataFrame): DataFrame = {
      val inter = cand.select("id_a", "id_b").distinct()
        .join(aSh.toDF("id_a", "sh"), "id_a")
        .join(freshSh.toDF("id_b", "sh"), Seq("id_b", "sh"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
      inter
        .join(aSizes.toDF("id_a", "na"), "id_a")
        .join(freshSizes.toDF("id_b", "nb"), "id_b")
        // SAME integer quantization as verifiedNearDupScores — comparing
        // floorRound(j, 4) >= minJaccard here while the batch path compares
        // jacc_q >= round(minJaccard·10⁴) would make the two dedup paths
        // disagree on any threshold off the 4-decimal grid (e.g. 0.84994:
        // grid 8500 vs round 8499)
        .filter(floor(col("i") / (col("na") + col("nb") - col("i")) * 10000
          + 0.5).cast("long") >= math.round(minJaccard * 10000))
        .select(col("id_b").as(idCol))
    }
    val dominated = dominatedBy(candCorpus, index.shingles, index.sizes)
      .unionByName(dominatedBy(candBatch, freshSh, freshSizes))
      .distinct()
    fresh.select(col(idCol)).join(dominated, Seq(idCol), "left_anti")
  }

  /** Step-1 exact collapse of [[dedupCorpus]]: one representative (min id)
    * per normalized-content fingerprint, carrying its text.
    */
  def exactReps(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    fingerprints(docs, idCol, textCol)
      .groupBy("__fp").agg(min(col(idCol)).as(idCol))
      .join(docs, idCol)
      .select(col(idCol), col(textCol))

  /** THE exact-duplicate fingerprint relation `(idCol, __fp)` — one
    * definition (md5 over the normalized text) shared by [[exactReps]] and
    * [[exactDupPairs]], so the dedup path and the leakage-repair path can
    * never disagree about which documents are exact duplicates.
    */
  private def fingerprints(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), md5(TextOps.normalized(col(textCol))).as("__fp"))

  /** Steps 2–3 of [[dedupCorpus]]: MinHash+LSH candidate pairs among `reps`,
    * verified with exact shingle-set Jaccard (only candidate pairs pay the
    * verify cost). Returns verified pairs with `id_a < id_b`.
    */
  def verifiedNearDupPairs(reps: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, numHashes: Int = 16, bands: Int = 4,
      persistShingles: Boolean = false): DataFrame =
    verifiedNearDupScores(reps, idCol, textCol,
      math.round(minJaccard * 10000), numHashes, bands, persistShingles)
      .select("id_a", "id_b")

  /** [[verifiedNearDupPairs]] KEEPING the verified similarity — the shared
    * pair table a composed pipeline (h122) builds ONCE at its lowest
    * consumer threshold and re-filters per stage (dedup keep at a strict
    * threshold, leakage repair at a permissive one), instead of paying the
    * LSH+verify chain per stage. `jacc_q` is the exact Jaccard in integer
    * ten-thousandths, `floor(j·10⁴ + 0.5)` — the same 4-dp rounding the
    * boolean form thresholds on, so `verifiedNearDupPairs(minJ)` ≡
    * `verifiedNearDupScores(round(minJ·10⁴))` projected to the id pair
    * (this delegation IS the implementation — the two cannot drift).
    */
  def verifiedNearDupScores(reps: DataFrame, idCol: String, textCol: String,
      minJaccardQ: Long, numHashes: Int = 16, bands: Int = 4,
      persistShingles: Boolean = false): DataFrame = {
    // ONE tokenize pass feeds BOTH consumers (the per-row MinHash signature
    // scan — native, see minhashSignaturesFromTokens — and the
    // exact-Jaccard verify's distinct shingle set) via a lazily-
    // materialized TOKEN relation (round 22; the round-21 form checkpointed
    // the 3× larger exploded-shingle relation and aggregated signatures
    // through a SortAggregate). At 100 TB this relation is a materialized
    // token table (the [[graft.queries.DupGraph]] token_rows posture);
    // localCheckpoint is its single-job analog.
    val toks = reps
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .localCheckpoint(eager = false)
    val cand = lshCandidatePairsFromTokens(toks, idCol, "__toks",
      numHashes, bands)
    val rows = toks.select(col(idCol),
      explode(TextOps.shingles3(col("__toks"))).as("shingle"))
    val ds0 = rows
      .select(col(idCol).as("doc"), xxhash64(col("shingle")).as("sh"))
      .distinct()
    val ds = if (persistShingles) ds0.persist() else ds0
    val sizes = ds.groupBy("doc").agg(count(lit(1)).as("n"))
    // equi-join on (id, shingle) both times → one row per common shingle
    val inter = cand
      .join(ds.toDF("id_a", "sh"), "id_a")
      .join(ds.toDF("id_b", "sh"), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .withColumn("jacc_q",
        floor(col("i") / (col("na") + col("nb") - col("i")) * 10000 + 0.5)
          .cast("long"))
      .filter(col("jacc_q") >= minJaccardQ)
      .select("id_a", "id_b", "jacc_q")
  }

  /** Split-leakage audit — the eval-contamination check a training
    * pipeline runs after splitting: every near-dup pair that CROSSES a
    * hash-split boundary (a test document with a near-duplicate in train
    * inflates eval scores exactly like benchmark contamination; Lee et
    * al. 2022 measure the effect directly). Consumes any (id_a, id_b)
    * near-dup pair relation — [[verifiedNearDupPairs]],
    * [[simhashNearDupPairs]], or a persisted pair table — and labels each
    * side with [[Splits.splitLabel]]'s deterministic hash split.
    *
    * Scale shape: the split label is a PURE FUNCTION of the id (the
    * [[Splits]] md5-bucket contract), so the audit is a scan-side
    * projection + filter over the pair relation — no join back to the
    * corpus, no shuffle beyond what the pair construction already paid.
    * Cross-split rows only; resolve findings by moving BOTH sides to the
    * earlier split or dropping the later doc (policy belongs to the
    * caller — the audit just surfaces the pairs deterministically).
    *
    * Output: (id_a, split_a, id_b, split_b).
    */
  def splitLeakage(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", trainBuckets: Int = 205,
      validBuckets: Int = 25): DataFrame =
    pairs.select(col(aCol).as("id_a"), col(bCol).as("id_b"))
      .withColumn("split_a",
        Splits.splitLabel(col("id_a"), trainBuckets, validBuckets))
      .withColumn("split_b",
        Splits.splitLabel(col("id_b"), trainBuckets, validBuckets))
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "split_a", "id_b", "split_b")

  /** Exact-duplicate pair relation — the EXACT channel of the leakage
    * audit, companion to [[verifiedNearDupPairs]]' near-dup channel: one
    * `(id_a, id_b)` edge per duplicate document, connecting it to its
    * fingerprint group's representative (`id_a` = the group's min id, so
    * `id_a < id_b` by construction). Star edges, not all-pairs: a
    * duplicate group of size g emits g−1 rows — LINEAR in the corpus,
    * where the naive within-group self-join is Σ g² (one viral boilerplate
    * page duplicated a million times would emit 10¹² pairs). The star
    * carries the same connectivity (the group IS the connected component),
    * which is all the audit and the repair need.
    *
    * Scale shape: one fingerprint exchange for the min-id aggregate
    * (map-side partial), one join back on the fingerprint — the
    * [[exactReps]] plan emitting the member ids instead of the kept text.
    */
  def exactDupPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol)
      .select(col(idCol).as("id_b"), col("__fp"))
    val reps = fp.groupBy("__fp").agg(min(col("id_b")).as("id_a"))
    fp.join(reps, "__fp")
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
  }

  /** Split-leakage REPAIR — the resolution step after [[splitLeakage]]
    * surfaces cross-split duplicate pairs (exact — [[exactDupPairs]] — or
    * near-dup — [[verifiedNearDupPairs]]): emit the assignment changes
    * that make the split leak-free under a declared policy. Output: one
    * row per affected document — `(doc_id, split_old, split_new, action)`
    * — to merge over the hash split downstream.
    *
    *   - `move_to_train`: move every member of a LEAKY CONNECTED COMPONENT
    *     (a dup component spanning >1 split) that is not already in train
    *     into train (`action='move'`, `split_new='train'`). Component
    *     closure, not per-pair patching, is what makes the repair
    *     IDEMPOTENT — precisely: under the RESOLVED assignment (hash
    *     labels overridden by these moves), every component is
    *     single-split, so re-AUDITING the repaired corpus finds no leak
    *     and a repair of the repaired state would emit nothing
    *     (PropertySpec pins this on the effective labels). Per-pair
    *     patching lacks the property: moving only cross-pair endpoints
    *     can turn a previously same-split pair (valid↔valid, one member
    *     moved) into a NEW cross pair. Note the function itself derives
    *     labels from ids ([[Splits.splitLabel]]) and cannot see moves a
    *     caller already applied — literally re-running it over the same
    *     pair relation re-derives the same moves (a deterministic replay,
    *     not a new finding); feed it only unrepaired splits.
    *   - `drop_later`: drop the LATER (greater-id) side of every
    *     cross-split pair (`action='drop'`, `split_new` null) — the
    *     Lee et al. 2022 resolution (keep the earliest copy, drop the
    *     rest from eval). Pairwise already idempotent: every cross pair
    *     loses its max endpoint, labels never change, and the edge set
    *     only shrinks, so no new cross pair can appear.
    *
    * Scale shape: `move_to_train` pays the [[connectedComponents]]
    * O(log n) star rounds over the PAIR relation (dup-mass-sized, never
    * corpus-sized) plus one component-keyed aggregate; the split label is
    * a pure function of the id ([[Splits.splitLabel]]), so labeling is
    * scan-side on both policies, and `drop_later` is a pure projection +
    * filter + distinct over the pairs.
    */
  def splitRepair(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", policy: String = "move_to_train",
      trainBuckets: Int = 205, validBuckets: Int = 25): DataFrame = {
    def label(c: Column) = Splits.splitLabel(c, trainBuckets, validBuckets)
    policy match {
      case "move_to_train" =>
        val comp = connectedComponents(pairs, aCol, bCol)
          .withColumn("split", label(col("id")))
        val leaky = comp.groupBy("comp")
          .agg(min(col("split")).as("__lo"), max(col("split")).as("__hi"))
          .filter(col("__lo") =!= col("__hi"))
          .select("comp")
        comp.join(leaky, "comp")
          .filter(col("split") =!= "train")
          .select(col("id").as("doc_id"), col("split").as("split_old"),
            lit("train").as("split_new"), lit("move").as("action"))
      case "drop_later" =>
        pairs
          .select(greatest(col(aCol), col(bCol)).as("doc_id"),
            label(col(aCol)).as("split_a"), label(col(bCol)).as("split_b"))
          .filter(col("split_a") =!= col("split_b"))
          .select(col("doc_id"), label(col("doc_id")).as("split_old"))
          .distinct()
          .select(col("doc_id"), col("split_old"),
            lit(null).cast("string").as("split_new"), lit("drop").as("action"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown splitRepair policy '$other' (move_to_train | drop_later)")
    }
  }

  /** Line-level boilerplate removal (the CCNet §4.1 pre-filter, Wenzek et
    * al. 2020): drop every line whose normalized content appears in at
    * least `minDf` DISTINCT documents — headers, footers, nav chrome, and
    * cookie banners repeat across a crawl far more often than real prose,
    * and removing them BEFORE doc-level dedup keeps chrome from welding
    * unrelated documents into near-dup pairs. Unlike [[exactReps]] (keep
    * one copy per duplicate DOC) or span dedup (keep the first copy of a
    * repeated span), the boilerplate rule drops ALL occurrences: a footer
    * in 10,000 documents is noise in every one of them.
    *
    * A "line" is a `splitRegex` segment of the text (default `"\n"`);
    * segments that are empty after trimming are ignored entirely (not
    * counted, not reassembled). The document frequency is per NORMALIZED
    * line ([[TextOps.normalized]] — case/whitespace-folded), counted once
    * per document however often the doc repeats it. Surviving lines
    * rejoin in original order with `joinStr` — pass the same delimiter
    * the split used so the operator is IDEMPOTENT: kept lines re-split
    * identically, their document frequencies can only have shrunk, so a
    * second pass drops nothing (PropertySpec pins this).
    *
    * Scale shape (the h44 span-dedup discipline): explode is scan-side;
    * the df count is a distinct + partial aggregate keyed by line
    * fingerprint (never ships line TEXT to the aggregate — md5 only); the
    * boilerplate set joins back on the fingerprint (AQE broadcasts it
    * when small — at crawl scale it is the high-df head, tiny next to the
    * line relation); reassembly is ONE doc-keyed exchange.
    *
    * Output: `idCol, n_lines:long, n_kept:long, text_clean` — text_clean
    * null when every line was boilerplate; docs with no nonempty lines
    * are absent (the [[Chunking.chunks]] convention).
    */
  def boilerplateLines(docs: DataFrame, idCol: String, textCol: String,
      splitRegex: String = "\n", joinStr: String = "\n",
      minDf: Int = 2, persistLines: Boolean = false): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    // the line relation feeds BOTH the df aggregate and the join's probe
    // side (different keys, so no ReusedExchange) — lazily checkpointed so
    // the corpus split+md5 pass runs once, not per consumer (round 22; at
    // 100 TB materialize the line relation as a table instead, the
    // token_rows posture). persistLines additionally pins it across
    // repeated CALLS (the verifiedNearDupPairs persistShingles pattern).
    val lines0 = docs
      .select(col(idCol), posexplode(split(col(textCol), splitRegex)))
      .withColumnRenamed("pos", "__i").withColumnRenamed("col", "__line")
      .filter(length(trim(col("__line"))) > 0)
      .withColumn("__fp", md5(TextOps.normalized(col("__line"))))
    val lines = if (persistLines) lines0.persist()
                else lines0.localCheckpoint(eager = false)
    val bp = lines.select(col(idCol), col("__fp")).distinct()
      .groupBy("__fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__fp"), lit(true).as("__bp"))
    lines
      .join(bp, Seq("__fp"), "left")
      .withColumn("__keep", col("__bp").isNull)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("__keep").cast("long")).as("n_kept"),
        // collect_list skips nulls → only kept lines enter; array_sort on
        // (__i, line) structs restores document order
        transform(
          array_sort(collect_list(
            when(col("__keep"), struct(col("__i"), col("__line"))))),
          s => s.getField("__line")).as("__kept"))
      .select(col(idCol), col("n_lines"), col("n_kept"),
        when(col("n_kept") > 0, array_join(col("__kept"), joinStr))
          .as("text_clean"))
  }

  /** Connected components over an undirected edge list — alternating
    * large-star / small-star rounds (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", 2014): each round is two shuffle-bounded
    * DataFrame passes over the edge set, and the edge set converges to
    * min-rooted stars in O(log n) rounds (naive min-label propagation needs
    * O(graph diameter) rounds — a chain of near-dup docs would serialize).
    * Returns (id, comp) with comp = minimum node id of the component, for
    * every node appearing in at least one edge.
    *
    * Driver involvement per round is one tiny aggregate (edge count + an
    * order-independent xxhash64/bit_xor checksum) for the convergence test —
    * edge data never leaves the executors. Each round localCheckpoints the
    * edge list to truncate lineage (a long-lived 100 TB job would swap in
    * reliable checkpointing; the shape is identical).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // canonical (u > v) directed form; self-loops dropped
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // large-star: connect every neighbor larger than u to the min of u's
    // neighborhood (incl. u) — detaches big nodes from non-min centers.
    // Output is directed-by-construction (emitted (v, m) has v > u ≥ m) but
    // NOT deduplicated: the round's only full dedup shuffle is small-star's
    // final distinct. Duplicates between here and there are harmless — the
    // min aggregate and distinct both partial-aggregate map-side, so the
    // extra shuffle volume is bounded by per-partition duplicate
    // multiplicity, and dropping the intermediate distinct removes one
    // full exchange+aggregate stage from every round (the rounds are
    // stage-latency-bound at small SF and shuffle-bound at 100 TB — this
    // wins on both).
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
    }
    // small-star: connect every smaller neighbor (and u itself) to the min
    // of u's smaller neighborhood — flattens chains into stars.
    // PRECONDITION: input edges already directed (u > v, no self-loops) —
    // exactly largeStar's output form — so the old re-canonicalization
    // (greatest/least + distinct, a full extra shuffle per round) is gone.
    def smallStar(dir: DataFrame): DataFrame = {
      val m = dir.groupBy("u").agg(min(col("v")).as("m"))
      dir.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    // set-equality probe: count + order-independent checksum (bit_xor never
    // overflows, unlike a long sum under ANSI mode). PROBABILISTIC: two
    // consecutive DIFFERENT edge sets with equal counts would also need
    // equal 64-bit xors to falsely terminate — probability ~2^-64 per round
    // under xxhash64, i.e. negligible next to hardware fault rates; a
    // deterministic `except().count()` check would cost an extra wide
    // shuffle per round for no practical gain. Alternating star rounds
    // also shrink-or-hold the edge count monotonically toward the rooted
    // forest, so the count component alone rules out most non-fixpoints.
    def probe(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // eager=false: the convergence probe right below is the action that
    // materializes each round's checkpoint — one job per round instead of
    // a separate checkpoint job plus the probe
    var edges = canon(pairs.select(col(aCol).as("u"), col(bCol).as("v")))
      .localCheckpoint(eager = false)
    var (n0, x0) = probe(edges)
    var converged = n0 == 0
    var it = 0
    while (!converged && it < maxIter) {
      edges = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val (n1, x1) = probe(edges)
      converged = n1 == n0 && x1 == x0
      n0 = n1; x0 = x1; it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    // converged form is min-rooted stars: (child, root) edges
    edges.select(col("u").as("id"), col("v").as("comp"))
      .union(edges.select(col("v").as("id"), col("v").as("comp")))
      .groupBy("id").agg(min(col("comp")).as("comp"))
  }

  /** PageRank over an undirected pair graph (e.g. the h41 near-dup pairs):
    * authority scoring that picks the CANONICAL document inside a duplicate
    * neighborhood — the doc most near-duplicated by others outranks its
    * copies, a better representative than min-id when duplicates differ in
    * quality. Fixed iteration count, damping 0.85, scores in exact
    * micro-units: init 1.000000; each round
    * `score' = 0.15 + 0.85 · Σ_in floor(score_u / deg_u)` with the
    * per-neighbor contribution an exact integer division (`div`), the sum
    * exact integer arithmetic (order-independent), and the single damping
    * multiply one IEEE double op on an integer-valued double — identical in
    * every engine and partitioning, so a DuckDB oracle replays it
    * bit-for-bit. Isolated docs (no near-dup edges) are absent by design.
    *
    * Input hygiene: the pair list is canonicalized defensively — self-pairs
    * are dropped and (a,b)/(b,a)/repeated rows collapse to one undirected
    * edge via least/greatest + distinct — so duplicate or mirrored input
    * rows cannot inflate degrees or contribution sums. For pre-canonical
    * inputs (e.g. [[simhashNearDupPairs]], which emits distinct id_a<id_b
    * rows) the guard is a no-op on the values and costs one small exchange
    * on the edge list.
    *
    * 100 TB posture: the graph is near-dup pairs — a small fraction of the
    * corpus. Per iteration: ONE co-partitioned join of edges⋈scores on src
    * (deg rides the edge rows, paid once up front) and ONE shuffle on dst
    * for the partial-aggregated contribution sum; k iterations = k bounded
    * shuffles, same stage discipline as [[connectedComponents]] (for long
    * chains, localCheckpoint per round would truncate lineage the same
    * way — at 3 rounds the plan stays shallow without it).
    */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
      iterations: Int = 3): DataFrame = {
    // NOTE: no localCheckpoint here, deliberately — the per-iteration
    // references to withDeg are identical subplans that ReuseExchange
    // already dedupes, and a checkpoint's LogicalRDD hides statistics from
    // AQE (the small scores side stops broadcasting), which measured ~2x
    // SLOWER at sf0.1. Graph.triangleStats/labelPropagation DO checkpoint:
    // their branches exchange on different keys, where reuse can't apply.
    val canonical = pairs
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val edges = canonical.select(col("a").as("src"), col("b").as("dst"))
      .union(canonical.select(col("b").as("src"), col("a").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src")
    var scores = deg.select(col("src").as("node"), lit(1000000L).as("score"))
    for (_ <- 1 to iterations) {
      val contrib = withDeg.join(scores, col("src") === col("node"))
        .select(col("dst"), expr("score div deg").as("c"))
      scores = contrib.groupBy("dst").agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(150000L) +
            floor(lit(0.85) * col("s").cast("double")).cast("long")).as("score"))
    }
    scores.select(col("node"), col("score").as("pr_micro"),
      (col("score").cast("double") / 1000000.0).as("pagerank"))
  }

  /** Transitive near-dup clustering — the cluster-complete alternative to
    * [[dedupCorpus]]'s greedy pairwise keep: exact collapse → LSH candidates
    * → Jaccard verify → connected components over the verified pairs.
    * Returns (idCol, cluster_rep) for every doc in at least one verified
    * pair; cluster_rep = min doc id of the cluster. A cluster-based
    * keep-list is `reps` minus rows where `idCol != cluster_rep` (docs in no
    * pair are implicitly their own singleton cluster).
    */
  def dedupClusters(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val reps = exactReps(docs, idCol, textCol)
    val pairs = verifiedNearDupPairs(reps, idCol, textCol, minJaccard, numHashes, bands)
    dedupClustersFromPairs(pairs, idCol)
  }

  /** Benchmark decontamination — the pass an LLM data pipeline runs before
    * training: for every (benchmark doc, corpus doc) pair, the fraction of
    * the benchmark doc's DISTINCT 3-gram shingles contained in the corpus
    * doc (asymmetric containment, not Jaccard: a benchmark question pasted
    * into a long web page is full contamination even though the page's
    * Jaccard with it is tiny). Returns pairs at or above `minContainment`
    * with the 4-dp-rounded score; training docs in the output are the ones
    * to drop or flag.
    *
    * 100 TB posture: both sides fold shingles to xxhash64 longs scan-side
    * and the pair discovery is an equi-join on the shingle hash — cost is
    * proportional to SHARED shingle occurrences, never |bench|·|corpus|.
    * The benchmark side is tiny in practice, so its shingle set broadcasts
    * and the corpus side streams through one map-side join.
    */
  def contaminationPairs(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, minContainment: Double): DataFrame =
    contaminationPairsFromShingles(
      shingleRows(corpus, idCol, textCol), shingleRows(bench, idCol, textCol),
      idCol, "shingle", minContainment)

  /** [[contaminationPairs]] from ALREADY-BUILT shingle relations for the
    * two sides (`idCol`, `shingleCol` [, others — ignored]) — the
    * [[shingleRows]] decomposition. When the benchmark set is a slice of
    * the corpus (the declared h28 shape), BOTH sides filter from one
    * materialized relation and the corpus is tokenized exactly once
    * pipeline-wide. [[contaminationPairs]] delegates here, so the paths
    * cannot drift. Shingles fold to xxhash64 here, not in the stored
    * relation, keeping the shared table reusable by consumers that need
    * raw shingles (novelty df, Jaccard).
    */
  def contaminationPairsFromShingles(corpusShingles: DataFrame,
      benchShingles: DataFrame, idCol: String, shingleCol: String,
      minContainment: Double): DataFrame = {
    def fold(df: DataFrame, as: String): DataFrame = df
      .select(col(idCol).as(as), xxhash64(col(shingleCol)).as("sh"))
      .distinct()
    val cs = fold(corpusShingles, "doc_id")
    val bs = fold(benchShingles, "bench_id")
    val sizes = bs.groupBy("bench_id").agg(count(lit(1)).as("nb"))
    bs.join(cs, "sh")
      .filter(col("bench_id") =!= col("doc_id"))
      .groupBy("bench_id", "doc_id").agg(count(lit(1)).as("i"))
      .join(sizes, "bench_id")
      .withColumn("containment",
        Det.floorRound(col("i").cast("double") / col("nb").cast("double"), 4))
      .filter(col("containment") >= minContainment)
      .select("bench_id", "doc_id", "containment")
  }

  /** Embedding near-dup: pairs within a blocking key whose cosine similarity
    * (computed in double, sequential like the oracle) meets the threshold.
    */
  def embeddingNearDupPairs(embs: DataFrame, idCol: String, vecCol: String,
      blockCol: String, minCosine: Double): DataFrame = {
    val a = embs.select(col(idCol).as("id_a"), col(blockCol).as("blk"),
      col(vecCol).as("va"))
    val b = embs.select(col(idCol).as("id_b"), col(blockCol).as("blk"),
      col(vecCol).as("vb"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Det.floorRound(Similarity.cosine(col("va"), col("vb")), 4))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
