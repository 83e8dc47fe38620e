package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The shared near-dup constructions over `documents`:
  *
  *   - [[pairs]]: THE SimHash pair graph
  *     ([[graft.extensions.Dedup.simhashNearDupPairs]] at maxHamming=2,
  *     bands=4, sigBits=32) consumed by four declared queries: h65
  *     (PageRank), h66 (label propagation), h67 (triangles), h78 (weighted
  *     PageRank).
  *   - [[verifiedPairs]]: THE MinHash+LSH→exact-Jaccard verified pair table
  *     ([[graft.extensions.Dedup.verifiedNearDupPairs]] over
  *     [[graft.extensions.Dedup.exactReps]] at minJaccard=0.5, 16 hashes,
  *     4 bands) consumed by h16 (greedy keep-list) and h23 (transitive
  *     clusters).
  *   - [[h61CorpusIndex]]: h61's declared "existing corpus"
  *     (documents with even doc_id) as a
  *     [[graft.extensions.Dedup.CorpusIndex]] — the fingerprint / LSH
  *     band-row / shingle tables the incremental-dedup daily run reads
  *     instead of re-scanning the accumulated corpus per batch.
  *   - [[shingleRows]]: the exploded (doc_id, source, shingle) relation —
  *     the shared tokenise+shingle prefix of h5 (MinHash+LSH candidates)
  *     and h6 (exact n-gram Jaccard).
  *
  * By default every call builds the graph from scratch — each query stays a
  * self-contained plan, which is what the correctness gate and the plan-shape
  * pins exercise. `enableMaterialization()` opts a process into computing the
  * graph ONCE per scale-dir and sharing the localCheckpoint'd result across
  * consumers — the "materialize signatures/pairs once, then run N analytics"
  * posture a real 100 TB pipeline would use (one bucketed signature table
  * feeding every downstream graph job) rather than paying the corpus scan +
  * banding four times. Bench opts in (round-7 change); Verify and the test
  * suites do not, so oracle comparisons always exercise the full build.
  *
  * Lifecycle: the cache is process-scoped and keyed by data dir, but a
  * cached DataFrame is bound to the SparkSession that built it — so each
  * lookup validates `df.sparkSession eq s` and rebuilds on mismatch (a
  * process that stops/recreates its session, or runs two sessions, never
  * sees a DataFrame referencing a stopped context). Checkpoint blocks live
  * until the SparkSession stops or the cached RDD is GC'd (Spark's
  * ContextCleaner unpersists dropped RDDs); `reset()` drops the references
  * for long-lived services.
  */
object DupGraph {

  /** The canonical label set of the shared constructions — ONE place, so
    * the consumers that enumerate them cannot drift from each other:
    * Bench's eager prebuild loop, its prebuilt-all stall-threshold check,
    * and Round12Spec's construction-side shuffle-volume pins all derive
    * from this list (via [[constructionBuilders]]). Adding a label here
    * without a builder case throws at first use; adding one without a
    * Round12Spec ceiling fails that suite's completeness assertion.
    * Order = Bench's historical prebuild order, keeping the per-label
    * prebuild timings in BENCH_r* artifacts comparable across rounds.
    */
  val constructionLabels: Seq[String] =
    Seq("pairs", "verified_pairs", "h61_corpus_index", "shingle_rows",
      "token_rows")

  /** label → fresh construction plans, in [[constructionLabels]] order —
    * THE enumeration Bench's prebuild and Round12Spec's volume pins both
    * iterate, so the label list, the builders, and the guards cannot
    * drift. A label added to [[constructionLabels]] without a case here
    * fails loudly (MatchError) the first time anything enumerates the
    * constructions.
    */
  def constructionBuilders(s: SparkSession,
      dir: String): Seq[(String, () => Seq[DataFrame])] =
    constructionLabels.map {
      case l @ "pairs"          => l -> (() => Seq(pairs(s, dir)))
      case l @ "verified_pairs" => l -> (() => Seq(verifiedPairs(s, dir)))
      case l @ "h61_corpus_index" => l -> { () =>
        val idx = h61CorpusIndex(s, dir)
        Seq(idx.fingerprints, idx.bandRows, idx.shingles, idx.sizes)
      }
      case l @ "shingle_rows"   => l -> (() => Seq(shingleRows(s, dir)))
      case l @ "token_rows"     => l -> (() => Seq(tokenRows(s, dir)))
    }

  @volatile private var materialize = false
  private val memo = new ConcurrentHashMap[String, DataFrame]()
  private val memoVerified = new ConcurrentHashMap[String, DataFrame]()

  /** Memoized build, revalidated against the live session: a hit built by a
    * different (possibly stopped) SparkSession is discarded and rebuilt.
    */
  private def cachedFor(m: ConcurrentHashMap[String, DataFrame],
      dir: String, s: SparkSession)(build: () => DataFrame): DataFrame =
    m.compute(dir, (_, prev) =>
      if (prev != null && (prev.sparkSession eq s)) prev
      else build().localCheckpoint(false))

  /** Opt this process into one-shot construction materialization (Bench). */
  def enableMaterialization(): Unit = { materialize = true }

  /** Drop cached constructions (blocks are freed by ContextCleaner once the
    * RDDs are unreferenced) and return to build-per-call.
    */
  def reset(): Unit = {
    memo.clear(); memoVerified.clear(); memoIndex.clear()
    memoShingles.clear(); memoTokens.clear(); materialize = false
  }

  private val memoTokens = new ConcurrentHashMap[String, DataFrame]()

  /** The tokenized-corpus relation (doc_id, toks, n_tokens) over `dir`'s
    * documents ([[graft.extensions.Chunking.tokenRows]]) — the shared
    * tokenize prefix of h109's anchor scan (which re-tokenized the corpus
    * the shingle relation had already paid to tokenize). Built per call by
    * default; built-once-and-shared after [[enableMaterialization]] — at
    * 100 TB a bucketed token table, the same posture as [[shingleRows]].
    */
  private def buildTokenRows(s: SparkSession, dir: String): DataFrame =
    graft.extensions.Chunking.tokenRows(
      graft.Tables.documents(s, dir), "doc_id", "text")

  def tokenRows(s: SparkSession, dir: String): DataFrame = {
    if (!materialize) buildTokenRows(s, dir)
    else cachedFor(memoTokens, dir, s)(() => buildTokenRows(s, dir))
  }

  private val memoShingles = new ConcurrentHashMap[String, DataFrame]()

  /** The exploded (doc_id, source, shingle) 3-gram shingle relation over
    * `dir`'s documents ([[graft.extensions.Dedup.shingleRows]]) — the
    * shared scan-side prefix of h5 (MinHash banding re-hashes every shingle
    * 16×) and h6 (exact-Jaccard distinct + self-join). Built per call by
    * default; built-once-and-shared after [[enableMaterialization]] — the
    * "tokenize/shingle the corpus once into a table, run every
    * signature/verify pass from it" posture, the largest shared prefix a
    * dedup pipeline materializes (at 100 TB this is a bucketed table, not
    * a checkpoint).
    */
  private def buildShingleRows(s: SparkSession, dir: String): DataFrame =
    graft.extensions.Dedup.shingleRows(
      graft.Tables.documents(s, dir), "doc_id", "text",
      carryCols = Seq("source"))

  def shingleRows(s: SparkSession, dir: String): DataFrame = {
    if (!materialize) buildShingleRows(s, dir)
    else cachedFor(memoShingles, dir, s)(() => buildShingleRows(s, dir))
  }

  /** The standard near-dup pair graph (id_a, id_b, hamming) for `dir`'s
    * documents table — built per call, or built-once-and-shared after
    * [[enableMaterialization]].
    */
  private def buildPairs(s: SparkSession, dir: String): DataFrame =
    graft.extensions.Dedup.simhashNearDupPairs(
      graft.Tables.documents(s, dir), "doc_id", "text",
      maxHamming = 2, bands = 4, sigBits = 32)

  def pairs(s: SparkSession, dir: String): DataFrame = {
    if (!materialize) buildPairs(s, dir)
    // lazy checkpoint: the first action over the first consumer computes the
    // pair RDD and pins it; a cancelled first job just defers the pin to the
    // next action. ~pair-count rows (1292 at sf0.1), trivially memory-safe.
    else cachedFor(memo, dir, s)(() => buildPairs(s, dir))
  }

  /** The standard verified near-dup pair table (id_a, id_b) for `dir`'s
    * documents — [[graft.extensions.Dedup.verifiedNearDupPairs]] over the
    * exact-collapse representatives at the declared-query parameters
    * (minJaccard=0.5, 16 MinHashes, 4 bands). Built per call, or
    * built-once-and-shared after [[enableMaterialization]] — the
    * "materialize the verified-pair table, then run keep-list AND
    * clustering from it" posture named in the dedupCorpus scaladoc,
    * exposed through [[graft.extensions.Dedup.dedupCorpusFromPairs]] /
    * dedupClustersFromPairs.
    */
  private def buildVerifiedPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir)
    graft.extensions.Dedup.verifiedNearDupPairs(
      graft.extensions.Dedup.exactReps(docs, "doc_id", "text"),
      "doc_id", "text", minJaccard = 0.5, numHashes = 16, bands = 4)
  }

  def verifiedPairs(s: SparkSession, dir: String): DataFrame = {
    if (!materialize) buildVerifiedPairs(s, dir)
    else cachedFor(memoVerified, dir, s)(() => buildVerifiedPairs(s, dir))
  }

  private val memoIndex =
    new ConcurrentHashMap[String, graft.extensions.Dedup.CorpusIndex]()

  /** h61's existing-corpus index (documents with doc_id % 2 = 0, 16 hashes,
    * 4 bands — the query's declared parameters): three corpus-sized tables
    * ([[graft.extensions.Dedup.CorpusIndex]]) that a daily incremental-dedup
    * pipeline materializes once per corpus. Built per call by default;
    * built-once-and-shared (each table localCheckpoint'd) after
    * [[enableMaterialization]].
    */
  /** Materialize the shared constructions as BUCKETED PARQUET TABLES (via
    * [[graft.sources.Bucketing]]) instead of localCheckpoint blocks, and
    * install the catalog read-backs in the memo so every consumer
    * transparently reads the bucketed tables. This is the layout the 100 TB
    * posture names: a persistent signature/pair warehouse, not
    * memory-resident checkpoint blocks — survives the session, and the
    * bucket metadata carries each table's hash partitioning into consumer
    * plans so Catalyst drops the exchanges the checkpoint path still pays:
    *
    *   - `shingle_rows` bucketed by `doc_id` → h5's per-doc signature
    *     aggregate and h6's (doc_id, shingle) distinct need NO shuffle
    *     (HashPartitioning(doc_id) satisfies both clustered distributions —
    *     subset-key co-location);
    *   - `pairs` / `verified_pairs` bucketed by `id_a` → pair-sized tables
    *     whose downstream graph/CC joins re-key per iteration; persisted for
    *     layout parity, the consumer win rides the corpus-sized relation.
    *
    * Returns (label, build seconds) per table. Round9Spec pins the exchange
    * elimination and consumer equality; ScaleBench's `<N>xmatbkt` mode runs
    * the full consumer suite over this layout.
    *
    * Bucket-count guidance at real scale: size so one bucket ≈ one task
    * (128–512 MB) — see [[graft.sources.Bucketing]]; the default 8 suits
    * the test fixtures.
    */
  def materializeBucketed(s: SparkSession, dir: String,
      buckets: Int = 8): Seq[(String, Double)] = {
    materialize = true
    val suffix = Integer.toHexString(dir.hashCode)
    // write one bucketed table, return the catalog read-back + timing
    def writeTbl(label: String, bucketCols: Seq[String],
        build: () => DataFrame): (DataFrame, (String, Double)) = {
      val table = s"graft_bkt_${suffix}_$label"
      val t0 = System.nanoTime()
      s.sql(s"DROP TABLE IF EXISTS $table")
      // the in-memory catalog forgets tables across JVMs but the warehouse
      // directory persists — a stale dir makes saveAsTable fail, so clear it
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.sources.Bucketing.writeBucketed(
        build(), table, bucketCols, buckets, sortCols = bucketCols)
      (s.table(table), (label, (System.nanoTime() - t0) / 1e9))
    }
    def put(m: ConcurrentHashMap[String, DataFrame], label: String,
        bucketCols: Seq[String], build: () => DataFrame): (String, Double) = {
      val (df, timing) = writeTbl(label, bucketCols, build)
      m.put(dir, df)
      timing
    }
    val base = Seq(
      put(memoShingles, "shingle_rows", Seq("doc_id"),
        () => buildShingleRows(s, dir)),
      put(memo, "pairs", Seq("id_a"), () => buildPairs(s, dir)),
      put(memoVerified, "verified_pairs", Seq("id_a"),
        () => buildVerifiedPairs(s, dir)))
    // h61's corpus index: four tables, each bucketed by ITS join key in the
    // incremental-dedup plan — fingerprints by the anti-join fingerprint,
    // band rows by the LSH bucket (HashPartitioning(bucket) satisfies the
    // (band, bucket) clustering), shingles/sizes by doc — so the
    // corpus-sized side of every steady-state join arrives pre-partitioned
    val idx = graft.extensions.Dedup.corpusIndex(
      graft.Tables.documents(s, dir)
        .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
      "doc_id", "text", numHashes = 16, bands = 4)
    val (fpT, fpTime) = writeTbl("h61_fingerprints", Seq("__fp"), () => idx.fingerprints)
    val (brT, brTime) = writeTbl("h61_band_rows", Seq("bucket"), () => idx.bandRows)
    val (shT, shTime) = writeTbl("h61_shingles", Seq("doc"), () => idx.shingles)
    val (szT, szTime) = writeTbl("h61_sizes", Seq("doc"), () => idx.sizes)
    memoIndex.put(dir,
      graft.extensions.Dedup.CorpusIndex(fpT, brT, shT, szT))
    // token_rows bucketed by doc_id — h109's downstream doc-keyed island
    // tail and reassembly join land on the table's own partitioning
    val tokTime = put(memoTokens, "token_rows", Seq("doc_id"),
      () => buildTokenRows(s, dir))
    base ++ Seq(fpTime, brTime, shTime, szTime, tokTime)
  }

  def h61CorpusIndex(s: SparkSession, dir: String): graft.extensions.Dedup.CorpusIndex = {
    def build(): graft.extensions.Dedup.CorpusIndex =
      graft.extensions.Dedup.corpusIndex(
        graft.Tables.documents(s, dir)
          .filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
        "doc_id", "text", numHashes = 16, bands = 4)
    if (!materialize) build()
    else memoIndex.compute(dir, (_, prev) =>
      if (prev != null && (prev.fingerprints.sparkSession eq s)) prev
      else {
        import org.apache.spark.sql.functions.{col, count, lit}
        // Materialized build rides the SHARED token relation (round 22):
        // the full-corpus [[tokenRows]] checkpoint filtered to the even
        // half — the tokenize pass, the single most expensive scan-side
        // op, runs once for h109's anchors, h5/h124's signatures AND both
        // h61 index sides instead of once per table (signatures are the
        // per-row native form — no aggregate exchange). `sizes` derives
        // from the CHECKPOINTED shingle table (the round-21 form
        // checkpointed idx.sizes, whose plan re-ran the whole
        // explode+distinct chain a fourth time). Row-identical either way
        // — the per-call build() above stays the self-contained plan
        // Verify exercises.
        val docsEven = graft.Tables.documents(s, dir)
          .filter(col("doc_id") % 2 === 0)
        val toks = tokenRows(s, dir).filter(col("doc_id") % 2 === 0)
        val idx = graft.extensions.Dedup.corpusIndexFromTokens(
          docsEven, toks, "doc_id", "toks", "text", numHashes = 16, bands = 4)
        val sh = idx.shingles.localCheckpoint(false)
        graft.extensions.Dedup.CorpusIndex(
          idx.fingerprints.localCheckpoint(false),
          idx.bandRows.localCheckpoint(false),
          sh,
          sh.groupBy("doc").agg(count(lit(1)).as("n")).localCheckpoint(false))
      })
  }
}
