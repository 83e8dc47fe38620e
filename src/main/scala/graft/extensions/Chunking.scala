package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window chunking, sequence packing, and span-level deduplication —
  * the "turn a document corpus into fixed-budget training examples" stage of
  * an LLM data pipeline.
  *
  * Scale notes (100 TB posture):
  *   - [[chunks]] is scan-side only: tokenize → `sequence`/`explode` →
  *     codegen'd `slice`/`array_join` projections, no shuffle at all. Output
  *     amplification is the chunk-count factor (~n/stride per doc), the same
  *     data a downstream writer must materialize anyway.
  *   - [[packBins]] never builds a global order (a global `row_number` would
  *     funnel the corpus through one reducer). Documents are sharded by an
  *     md5 hex digit — 16 balanced, engine-portable shards; in production the
  *     shard count is the write parallelism — and the cumulative-token window
  *     runs per shard. Each shard's packing is an independent sort, so the
  *     stage parallelizes to the shard count and each bin maps to one
  *     training-file row group.
  *   - [[spanDedup]] shuffles once on the span fingerprint for the winner
  *     aggregate and once on the doc id for reassembly. The winner pass is a
  *     `groupBy(fp).agg(min(struct(id, idx)))` — partial-aggregatable
  *     (map-side combine), unlike a `row_number` window which must
  *     materialize every duplicate in one partition (same reasoning as the
  *     pipeline's X1 dedup, Curate.scala). At 100 TB the shuffled payload is
  *     (fp128, id, idx) per span plus the span text needed for reassembly;
  *     a thinner two-pass variant (ship fingerprints only, re-chunk on the
  *     reassembly side) trades a second tokenize pass for ~10× less shuffle
  *     volume and composes from the same pieces.
  */
object Chunking {

  /** Overlapping fixed-size token windows per document.
    *
    * Chunk `i` (0-based) covers tokens `[i·stride+1, i·stride+window]` of
    * the whitespace tokenization ([[TextOps.tokens]] contract), for
    * `i = 0 .. floor((n-1)/stride)` — every token belongs to ≥1 chunk,
    * consecutive chunks overlap by `window - stride` tokens, and trailing
    * chunks may be shorter than `window`. Empty/whitespace-only/null docs
    * produce no chunks.
    *
    * Output: `idCol, chunk_idx:int, n_toks:int, chunk_text`.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), expr(s"int((__n - 1) div $stride)")))
          .as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx").cast("int").as("chunk_idx"),
        least(lit(window), col("__n") - col("chunk_idx") * stride)
          .cast("int").as("n_toks"),
        array_join(
          slice(col("__toks"), col("chunk_idx") * stride + 1, lit(window)),
          " ").as("chunk_text"))
  }

  /** Deterministic sequence packing: assign each document to a training bin
    * of ~`budget` tokens.
    *
    * Shard = first md5 hex digit of the id (16 engine-portable shards);
    * within a shard documents take the pseudorandom total order
    * `(md5(id), id)` (same construction as [[Sampling.groupTopK]]), and a
    * document lands in the bin where its cumulative token count ends:
    * `bin = (cumsum - 1) div budget`. This is concat-and-split-at-document-
    * boundaries — the scalable deterministic variant of greedy first-fit
    * packing (which is an inherently sequential recurrence): bins average
    * exactly `budget` tokens, a straddling document overflows its bin by at
    * most its own length, and the assignment is a pure function of the ids
    * and token counts present (stable under repartitioning and engine).
    *
    * Output: `idCol, shard, pos:int, n_toks:int, bin:int` — `pos` is the
    * document's packing position within its shard.
    */
  def packBins(docs: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame =
    packBinsCarrying(docs, idCol, textCol, budget, Nil)
      .select(idCol, "shard", "pos", "n_toks", "bin")

  /** [[packBins]] carrying extra scan-side columns through the packing
    * (e.g. a per-doc content hash for the versioned export manifest) —
    * same plan, same output plus the carried columns at the end.
    */
  private[graft] def packBinsCarrying(docs: DataFrame, idCol: String,
      textCol: String, budget: Int, carry: Seq[Column]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val h = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    val cum = sum(col("n_toks")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    docs
      .select(col(idCol) +:
        size(TextOps.tokens(col(textCol))).cast("int").as("n_toks") +:
        substring(h, 1, 1).as("shard") +: h.as("__h") +: carry: _*)
      .filter(col("n_toks") > 0)
      .withColumn("pos", row_number().over(w))
      .withColumn("__cum", cum)
      // `div` = exact integer division (Column./ is double division, which
      // truncates toward zero after an inexact double detour)
      .withColumn("bin", expr(s"int((__cum - 1) div $budget)"))
      .drop("__h", "__cum")
  }

  /** Deterministic EPOCH SHUFFLE — the serving-side twin of [[packBins]]:
    * a reproducible global permutation of the corpus per training epoch,
    * so every epoch reads a different order (shuffling between epochs is
    * standard training practice) yet any epoch's order can be replayed
    * exactly for debugging/resumption — the order is a pure function of
    * (ids present, `epochSeed`), stable under repartitioning and engine.
    *
    * Construction: key = `md5(epochSeed || ':' || id)`; shard = first 16
    * key bits mod `shards`; `pos` = rank of the key within its shard;
    * `global_pos` = shard offset (exclusive prefix sum of shard sizes) +
    * pos − 1, a bijection onto 0..N−1.
    *
    * 100 TB posture (re-sized round 19): NO global sort AND no per-shard
    * window — the rank is [[Ranking.globalRowNumber]]'s two-phase
    * range-rank over the total order `(shard, key, id)` (shards order
    * consecutively under it, so the 0-based global rank IS `global_pos`
    * and `pos` falls out as rank − shard offset). The original per-shard
    * `row_number()` window serialized each shard through ONE task —
    * parallelism = `shards` (default 16), a bottleneck on a wide cluster
    * unless the caller remembered to size shards to cluster width; the
    * range-rank spreads across `spark.sql.shuffle.partitions` REGARDLESS
    * of `shards`, which is now a purely LOGICAL parameter: part of the
    * permutation's identity (like the seed — changing it changes the
    * order, so it is pinned in the h118 oracle) and the file-grouping
    * unit a production writer emits (one file per shard sorted by `pos`,
    * the epoch reader concatenates in `(shard, pos)` order). The offset
    * join broadcasts a `shards`-row relation; the md5 keys are uniform,
    * so shards balance to N/shards ± noise regardless of id clustering.
    *
    * Output: `idCol, shard:int, pos:long, global_pos:long`.
    */
  def epochShuffle(docs: DataFrame, idCol: String, epochSeed: Long,
      shards: Int = 16): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val k = md5(concat_ws(":", lit(epochSeed.toString), col(idCol).cast("string")))
    val keyed = docs.select(col(idCol), k.as("__k"))
      .withColumn("shard",
        (conv(substring(col("__k"), 1, 4), 16, 10).cast("long") % shards)
          .cast("int"))
    val ranked = Ranking.globalRowNumber(keyed,
      Seq(col("shard"), col("__k"), col(idCol)), "__gp")
    // exclusive prefix sum of shard sizes — a `shards`-row relation, so the
    // single-partition window and the broadcast join cost nothing; the
    // aggregate shares the rank's range exchange (ReuseExchange — the
    // Ranking correctness invariant)
    val offsets = ranked.groupBy("shard").agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("__offset"))
    // pos/global_pos stay LONG end-to-end (round 20): an int pos silently
    // overflows negative past ~2.1B rows per shard — reachable at the
    // advertised 100 TB posture when shards is small (it is a LOGICAL
    // parameter, not a parallelism knob, so nothing bounds per-shard rows)
    ranked.join(broadcast(offsets), "shard")
      .select(col(idCol), col("shard"),
        (col("__gp") - col("__offset")).as("pos"),
        (col("__gp") - 1).as("global_pos"))
  }

  /** TRAINING-SHARD EXPORT MANIFEST — the last meter of the serving path:
    * compose [[packBins]] (h43 sequence packing) and [[epochShuffle]]
    * (h118 epoch order) into numbered output shards and emit ONE manifest
    * row per shard — the WebDataset/TFRecord-manifest shape every training
    * loader consumes (shard id, row/doc/token counts, content
    * fingerprint). Idempotent re-export by construction: the manifest is a
    * pure function of (ids, token counts, epochSeed, budget, shardSize,
    * shards) — re-running emits the identical rows, no state or temp files
    * to reconcile (PropertySpec pins idempotence and row/token
    * conservation).
    *
    * Construction: packed sequences = [[packBins]]' (shard, bin) cells;
    * each sequence takes a global epoch position from [[epochShuffle]]
    * over `seq_id = shard ':' bin`; output shard = `global_pos div
    * shardSize` (the serving unit: shardSize sequences per exported file).
    * The fingerprint is [[Provenance]]'s 60-bit XOR row hash over
    * (doc id, seq_id, global_pos) — membership AND epoch order,
    * layout-independent, and sub-slice fingerprints XOR up into a dataset
    * version (the h70 Merkle property), so a loader can verify any shard
    * subset without rescanning the rest.
    *
    * 100 TB posture: every piece is an already-measured operator — the
    * packing is shard-parallel scan-side work, the epoch rank is the
    * two-phase range-rank over SEQUENCES (≈ corpus_tokens/budget rows, not
    * docs), the doc→sequence order join is seq_id-keyed (broadcast when
    * the order relation fits, shuffle-hash otherwise — the planner's
    * call), and the manifest is one partial-aggregated groupBy emitting
    * shard-count rows.
    *
    * Output: `out_shard:long, n_seqs, n_docs, n_tokens, content_fp`.
    */
  def exportManifest(docs: DataFrame, idCol: String, textCol: String,
      epochSeed: Long, budget: Int, shardSize: Long,
      shards: Int = 16): DataFrame =
    manifestCore(
      packBins(docs, idCol, textCol, budget),
      Seq(idCol, "seq_id", "global_pos"), idCol, epochSeed, shardSize, shards)

  /** [[exportManifest]] with a CONTENT-BEARING fingerprint: the XOR row
    * hash additionally covers `md5(textCol)`, so an in-place edit that
    * preserves a document's token count — invisible to packing and epoch
    * order, hence to [[exportManifest]]'s membership+order fingerprint —
    * still flips exactly its shards' fingerprints. This is the variant
    * [[incrementalExport]] diffs on: membership, order, AND content.
    * Identical counts/shards to [[exportManifest]] by construction (the
    * extra hash rides the packing scan; Round20Spec pins the equality on
    * everything but `content_fp`).
    */
  def exportManifestVersioned(docs: DataFrame, idCol: String, textCol: String,
      epochSeed: Long, budget: Int, shardSize: Long,
      shards: Int = 16): DataFrame =
    manifestCore(
      packBinsCarrying(docs, idCol, textCol, budget,
        Seq(md5(col(textCol)).as("__dfp"))),
      Seq(idCol, "__dfp", "seq_id", "global_pos"), idCol, epochSeed,
      shardSize, shards)

  /** Shared manifest tail: seq ids → epoch order → out_shard → one
    * partial-aggregated manifest row per shard with the XOR fingerprint
    * over `hashCols`.
    */
  private def manifestCore(packed0: DataFrame, hashCols: Seq[String],
      idCol: String, epochSeed: Long, shardSize: Long,
      shards: Int): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    // TWO consumers read the packed relation (the seq-id distinct feeding
    // the epoch order, and the manifest join) — checkpoint it so the
    // packing scan + per-shard cumulative window run once, not per branch
    // (h125 builds two manifests, so the round-21 form paid this chain
    // four times; guide §1.2 "don't compute twice")
    val packed = packed0
      .withColumn("seq_id", concat_ws(":", col("shard"), col("bin")))
      .localCheckpoint(eager = false)
    val seqs = packed.select(col("seq_id")).distinct()
    val order = epochShuffle(seqs, "seq_id", epochSeed, shards)
      .select(col("seq_id"), col("global_pos"))
    packed
      .join(order, "seq_id")
      // long, not int: out_shard = global_pos div shardSize inherits
      // global_pos' full range (the epochShuffle overflow note)
      .withColumn("out_shard", expr(s"global_pos div $shardSize"))
      .withColumn("__rh", Provenance.rowHash(hashCols))
      .groupBy(col("out_shard"))
      .agg(
        count_distinct(col("seq_id")).as("n_seqs"),
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).cast("long").as("n_tokens"),
        expr("bit_xor(__rh)").as("content_fp"))
  }

  /** INCREMENTAL SHARD RE-EXPORT (h125) — the daily-pipeline composition
    * of [[exportManifestVersioned]] and [[Provenance.snapshotDiff]]: given
    * two corpus versions, emit ONLY the output shards whose manifest row
    * changed (membership, epoch order, counts, or document content), so a
    * re-export rewrites churn, not the corpus. This is exactly what the
    * manifest's XOR-Merkle fingerprint exists for: a shard whose
    * (doc, content, sequence, position) multiset is untouched keeps its
    * fingerprint, whatever happened elsewhere.
    *
    * The diff IS [[Provenance.snapshotDiff]] keyed by `out_shard` over ALL
    * manifest columns (counts + fingerprint — the counts are implied by
    * the fingerprint up to 60-bit XOR collision; diffing the full row
    * closes even that). `change_type`: 'added' (shard exists only in v2),
    * 'removed' (only in v1), 'changed'.
    *
    * Blast-radius honesty (PropertySpec pins all three): identical corpus
    * → ZERO rows; a token-count-preserving text edit → exactly the shards
    * holding that document's sequences (packing and order are pure
    * functions of ids + token counts, so nothing else can move); an edit
    * that changes a token count can also shift every later bin in the
    * doc's pack shard (the cumulative-sum packing law) — still pack-shard-
    * bounded, never corpus-wide.
    *
    * 100 TB posture: two manifest builds (each the already-measured h120
    * plan — in production v1's manifest is a stored table, so the
    * steady-state cost is ONE build + a shard-count-sized diff join) and a
    * full-outer join over shard-count rows.
    *
    * Output: `out_shard:long, change_type, old_fp, new_fp` — the fps are
    * [[Provenance.rowHash]]es of the full manifest row, not the raw
    * `content_fp` (which is one of the hashed columns).
    */
  def incrementalExport(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String, epochSeed: Long, budget: Int,
      shardSize: Long, shards: Int = 16): DataFrame = {
    def m(d: DataFrame) = exportManifestVersioned(d, idCol, textCol,
      epochSeed, budget, shardSize, shards)
    Provenance.snapshotDiff(m(oldDocs), m(newDocs), "out_shard",
      Seq("n_seqs", "n_docs", "n_tokens", "content_fp"))
  }

  /** Span-level (paragraph-style) exact deduplication with reassembly:
    * split each document into non-overlapping `spanTokens`-token spans,
    * keep only the corpus-wide FIRST occurrence of each distinct span text
    * (first = smallest `(id, span index)`), and rebuild each document from
    * its surviving spans.
    *
    * Output: `idCol, n_spans:long, n_kept:long, text_clean` (`text_clean`
    * is null when every span of the document was dropped).
    */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    val spans = chunks(docs, idCol, textCol, spanTokens, spanTokens)
      .withColumn("__fp", md5(col("chunk_text")))
    // winner = the (id, chunk_idx)-min of each fingerprint group, found
    // with ONE window over the span hash (round 22, the h109 rewrite): the
    // aggregate+join form computed the span relation twice (two chunk
    // explodes) through a min(struct) SortAggregate and joined the
    // group-per-row winner relation back — corpus-sized on both counts.
    val keep = struct(col(idCol), col("chunk_idx")) ===
      min(struct(col(idCol), col("chunk_idx")))
        .over(Window.partitionBy("__fp"))
    spans
      .withColumn("__keep", keep)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("__keep").cast("long")).as("n_kept"),
        // collect_list skips nulls, so only kept spans enter the array;
        // array_sort on (chunk_idx, text) structs restores document order.
        transform(
          array_sort(collect_list(
            when(col("__keep"), struct(col("chunk_idx"), col("chunk_text"))))),
          s => s.getField("chunk_text")).as("__kept"))
      .select(col(idCol), col("n_spans"), col("n_kept"),
        when(col("n_kept") > 0, array_join(col("__kept"), " "))
          .as("text_clean"))
  }

  /** VARIABLE-LENGTH exact substring deduplication — the ExactSubstr pass
    * of Lee et al. 2022 (arXiv:2107.06499, "Deduplicating Training Data
    * Makes Language Models Better") re-expressed over `minTokens`-token
    * ANCHOR fingerprints instead of a corpus suffix array: every repeated
    * substring of ≥ minTokens tokens is exactly the union of its
    * (length − minTokens + 1) consecutive repeated anchors, so detecting
    * repeated anchors and merging overlapping loser windows with integer
    * interval math recovers the MAXIMAL duplicated spans (h44's
    * [[spanDedup]] removes fixed non-overlapping 16-token tiles and misses
    * any repeat that straddles a tile boundary; this pass removes the
    * full repeated range at token granularity, whatever its length).
    *
    * Contract: anchor `(d, w)` = tokens `[w, w + minTokens)` of doc `d`
    * (stride 1, 1-based, [[TextOps.tokens]] tokenization). Each distinct
    * anchor text's corpus-wide FIRST occurrence (smallest `(id, w)`) is the
    * winner; a token position is REMOVED iff some LOSER window covers it,
    * and consecutive removed positions merge into maximal spans (each
    * ≥ minTokens long by construction). A doc that first contributed a
    * span keeps it; later copies lose the whole maximal range. Caveat
    * (shared by suffix-array implementations that cut each repeat
    * independently): where two DIFFERENT repeats overlap, a winner's
    * positions can still be cut by the other repeat's loser window — the
    * rule is positional, deterministic, and engine-replayable, not
    * "at least one copy of every span survives verbatim".
    *
    * Scale shape: the anchor relation is corpus-TOKEN-sized (exactly the
    * suffix-array construction's input size) and everything heavier is
    * duplicate-mass-sized — the winner aggregate pays ONE map-side-partial
    * fingerprint exchange, and the join back either broadcasts the
    * aggregated winner relation (AQE, when the distinct-anchor set is
    * small) or re-keys on the same fingerprint so the anchor exchange is
    * shared (ReusedExchange under SMJ at scale); the island merge windows
    * and the span aggregates all share ONE doc-keyed exchange of LOSER
    * rows only (HashPartitioning(id) satisfies the (id, island)
    * clusterings, verified in the executed plan); and
    * reassembly is a scan-side higher-order filter against each doc's own
    * tiny span list (no token-level explode, no corpus-sized reassembly
    * shuffle — the HOF is interpreted but runs once per doc over ≤ n·|spans|
    * cheap long comparisons). Docs with < minTokens tokens skip anchoring
    * entirely and pass through the left join unchanged.
    *
    * Output: `idCol, n_tokens:long, n_removed:long, n_spans:long,
    * max_span:long, text_clean` — text_clean is the kept tokens joined by
    * single spaces (whitespace-normalized like every TextOps consumer),
    * null when every token was removed; empty/whitespace-only/null docs are
    * absent (the [[chunks]]/[[spanDedup]] convention).
    */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 16): DataFrame =
    substringDedupFromTokens(tokenRows(docs, idCol, textCol), idCol, minTokens)

  /** The tokenized-corpus relation `(idCol, toks:array<string>,
    * n_tokens:long)` that [[substringDedup]] anchors over — zero-token
    * (empty/whitespace-only/null) docs absent, per the [[chunks]]
    * convention. Exposed so a pipeline can MATERIALIZE the tokenization
    * once (a bucketed table at 100 TB — the
    * [[graft.queries.DupGraph]] shared-construction posture) and run
    * [[substringDedupFromTokens]] plus any other token-consuming pass from
    * it, instead of re-tokenizing the corpus per operator. Scan-side only:
    * tokenize + size, no shuffle (Round12Spec pins zero exchanges).
    */
  def tokenRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > 0)

  /** [[substringDedup]] over an already-tokenized corpus relation (the
    * [[tokenRows]] contract: `idCol, toks, n_tokens`, zero-token docs
    * absent) — identical output by construction (the convenience form
    * delegates here; ChunkingSpec pins the equality), letting the anchor
    * scan read a materialized token table instead of paying the corpus
    * tokenization per run.
    */
  def substringDedupFromTokens(tokens: DataFrame, idCol: String,
      minTokens: Int = 16): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    val k = minTokens
    val base = tokens
      .select(col(idCol), col("toks").as("__toks"),
        col("n_tokens").cast("long").as("__n"))
    val anchors = base
      .filter(col("__n") >= k)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(1L), col("__n") - (k - 1))).as("__w"))
      .select(col(idCol), col("__w"),
        md5(array_join(slice(col("__toks"), col("__w").cast("int"), lit(k)),
          " ")).as("__g"))
    // Losers = every anchor in its group except the (doc, w)-min: ONE
    // window over the anchor hash instead of the round-21 aggregate+join
    // (which computed the anchor scan TWICE — two Generate+md5 passes — and
    // broadcast the winner relation, a table with one row per DISTINCT
    // anchor group, i.e. corpus-sized: a guaranteed broadcast OOM at real
    // scale). Plan: 2 scans + SortAggregate exchange + broadcast → 1 scan +
    // one hash exchange (guide §2.4; the unordered whole-partition min
    // needs no window sort beyond the partitioning).
    val losers = anchors
      .withColumn("__win",
        min(struct(col(idCol), col("__w"))).over(Window.partitionBy("__g")))
      .filter(struct(col(idCol), col("__w")) =!= col("__win"))
      .select(col(idCol), col("__w"))
    val byDoc = Window.partitionBy(idCol).orderBy("__w")
    val spans = losers
      .withColumn("__prevEnd", max(col("__w") + (k - 1)).over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk",
        when(col("__prevEnd").isNull || col("__w") > col("__prevEnd") + 1, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__brk")).over(byDoc))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__w")).as("__s"), max(col("__w") + (k - 1)).as("__e"))
    val perDoc = spans.groupBy(idCol).agg(
      count(lit(1)).as("n_spans"),
      sum(col("__e") - col("__s") + 1).as("n_removed"),
      max(col("__e") - col("__s") + 1).as("max_span"),
      collect_list(struct(col("__s"), col("__e"))).as("__spans"))
    base.join(perDoc, Seq(idCol), "left")
      .withColumn("__kept",
        when(col("__spans").isNull, col("__toks"))
          .otherwise(filter(col("__toks"), (_, i) =>
            !exists(col("__spans"), sp =>
              (i.cast("long") + 1) >= sp.getField("__s") &&
                (i.cast("long") + 1) <= sp.getField("__e")))))
      .select(col(idCol),
        col("__n").as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("max_span"), lit(0L)).as("max_span"),
        when(size(col("__kept")) > 0, array_join(col("__kept"), " "))
          .as("text_clean"))
  }
}
