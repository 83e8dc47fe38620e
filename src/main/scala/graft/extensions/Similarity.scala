package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, per the north star:
  *   - `bruteForceTopK` — exact baseline: broadcast the (small) query set,
  *     score every corpus vector with a codegen'd higher-order-function
  *     cosine, take per-query top-k with a window. Cost O(|Q|·|corpus|) but
  *     fully distributed and shuffle-free until the final tiny top-k.
  *   - `lshTopK` — scale path: random-hyperplane LSH. Each vector gets a
  *     `nPlanes`-bit signature computed scan-side from deterministic
  *     md5-derived ±1 hyperplanes (engine-portable, DuckDB-oracled);
  *     candidates = same-bucket vectors, re-ranked exactly. At 100 TB the
  *     bucket join replaces the full cross product with collision groups
  *     (tunable recall via nPlanes/nTables).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double with
    * strictly sequential accumulation — the same op order as the DuckDB
    * oracle's list_aggregate('sum'), so rounded values agree cross-engine.
    *
    * Backed by the native codegen'd graft.functions.CosineSimilarity
    * expression (one fused allocation-free loop in WholeStageCodegen);
    * `cosineHof` is the built-in higher-order-function composition it
    * replaced — numerically identical (SimilaritySpec asserts bit equality),
    * ~10× slower on the pairwise hot paths because HOF lambdas are
    * interpreted.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.CosineSimilarity(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  /** Reference HOF formulation of [[cosine]] (kept for the equivalence test
    * and as the fallback shape for engines without the native expression).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Exact top-k neighbours per query vector (excluding self-matches).
    * Output: (query_id, rank, neighbor_id, cos).
    *
    * The final `row_number <= k` filter is NOT a single-reducer funnel:
    * Catalyst's InferWindowGroupLimit plans it as a map-side Partial
    * WindowGroupLimit (each scan partition forwards ≤ k rows per query)
    * before the query_id exchange, then a Final limit after — so the
    * per-query reducer handles ≤ k·P candidate rows, not the whole scored
    * corpus. PlanSpec pins this two-phase shape; the same final applies to
    * [[ivfTopK]]/[[lshTopK]] (whose candidate sets are bucket-pruned anyway).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Det.floorRound(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Hard-negative mining for contrastive training data: for each query
    * vector, the exact top-k most-similar corpus vectors carrying a
    * DIFFERENT label — the "closest wrong answers" that make the strongest
    * negatives. Output: (query_id, query_label, rank, neighbor_id,
    * neighbor_label, cos).
    *
    * Shape = [[bruteForceTopK]] with the label inequality fused into the
    * broadcast-join condition: the mismatch test culls pairs inside the
    * same codegen stage that scores them (no post-filter pass), self-pairs
    * are excluded for free (same label ⇒ dropped), and the row_number ≤ k
    * again plans as a two-phase WindowGroupLimit — each scan partition
    * forwards ≤ k candidates per query before the query_id exchange. At
    * real scale the scorer swaps for the [[ivfTopK]] bucketed candidate
    * generator with the same label predicate on the candidate join; the
    * exact form here is the recall baseline.
    *
    * NULL/degenerate labels (standard SQL `<>` semantics, matching the
    * DuckDB oracle, but worth knowing when building training data): a query
    * with a NULL label matches nothing (`<>` yields NULL) and is silently
    * absent from the output, NULL-label corpus rows are never returned as
    * negatives, and a query whose label covers the entire corpus has no
    * mismatching neighbor and likewise vanishes. Filter or coalesce labels
    * upstream if every query must appear.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("query_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("neighbor_label"))
    val scored = c.join(broadcast(q), col("neighbor_label") =!= col("query_label"))
      .withColumn("cos", Det.floorRound(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "query_label", "rank", "neighbor_id",
        "neighbor_label", "cos")
  }

  /** Matryoshka / progressive retrieval funnel: score every candidate on
    * only the first `dPrefix` embedding dimensions (cheap — a prefix slice
    * of a matryoshka-trained embedding preserves coarse geometry), keep the
    * top `m` per query, then re-rank ONLY those survivors with the
    * full-dimension cosine and return the top `k`. The standard two-stage
    * funnel for dropping full-precision scoring cost by dim/dPrefix while
    * keeping near-exact quality; fully deterministic (both stages order by
    * 4-dp floor-rounded score with neighbor-id tiebreak), so a DuckDB
    * oracle replays it exactly — unlike recall-based ANN, this needs no
    * weaker signal.
    *
    * Output: (query_id, rank, neighbor_id, cos_prefix, cos).
    *
    * 100 TB posture: stage 1 is the [[bruteForceTopK]] shape on a
    * dPrefix-slice — broadcast queries, one scan, map-side Partial
    * WindowGroupLimit forwarding ≤ m rows per query per partition (the
    * two-phase top-k PlanSpec pins for h2); stage 2 touches only q·m rows.
    * The full-dim vectors for stage 2 ride the stage-1 rows (no second
    * corpus scan or re-join), so full-precision reads stay proportional to
    * survivors, and the prefix slice is where a columnar store would also
    * prune IO (matryoshka dims stored first).
    */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dPrefix: Int, m: Int, k: Int): DataFrame = {
    require(m >= k, s"prefilter width m ($m) must be >= final k ($k)")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val pre = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_prefix", Det.floorRound(
        cosine(slice(col("qv"), 1, dPrefix), slice(col("cv"), 1, dPrefix)), 4))
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("cos_prefix").desc, col("neighbor_id"))
    val survivors = pre.withColumn("prn", row_number().over(w1))
      .filter(col("prn") <= m)
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    survivors
      .withColumn("cos", Det.floorRound(cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos_prefix", "cos")
  }

  /** Nearest-centroid assignment: the centroid set is BOUNDED (nCentroids),
    * so the argmax is strictly per-row work and runs IN the scan (round 22
    * — the native [[graft.functions.ArgMaxCosine]], reusing
    * [[graft.functions.CosineSimilarity]]'s exact arithmetic; ties to the
    * smaller cid, identical to the retired `max_by(cid, struct(acos,
    * -cid))`). One broadcast of the collected centroid ARRAY (one row),
    * zero exchanges, zero fan-out — the retired form joined every vector
    * against the centroid relation (nCentroids× rows) and re-assembled
    * per-vector rows through a SortAggregate (max_by-over-struct and
    * first-over-array have no fixed-width mutable buffer). `payload`
    * columns simply stay on the row. Precondition (unchanged): one row per
    * `neighbor_id`.
    */
  private def assignToCentroids(vectors: DataFrame, cent: DataFrame,
      payload: Seq[String]): DataFrame = {
    // the expression takes cid as long; an int-id corpus (ingest round-trip)
    // widens losslessly on the way in and narrows back on the way out
    val cidType = cent.schema("cid").dataType
    val centArr = cent.agg(
      sort_array(collect_list(
        struct(col("cid").cast("long").as("cid"), col("centroid"))))
        .as("__cents"))
    val cid = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ArgMaxCosine(
        org.apache.spark.sql.GraftColumnBridge.expression(col("cv")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("__cents"))))
    vectors.join(broadcast(centArr))
      .select(col("neighbor_id") +: cid.cast(cidType).as("cid") +:
        payload.map(col): _*)
  }

  /** Deterministic distributed k-means step, exact across engines and
    * partitionings: each component is quantized to micro-units
    * (`floor(x·10⁶ + 0.5)` as a long), per-cluster sums are exact integer
    * arithmetic (order-independent, unlike a double fold), and the mean is
    * ONE double division `sum / (n · 10⁶)` rendered to float — identical
    * IEEE ops in every engine, so the DuckDB oracle reproduces the
    * centroids bit-for-bit. Fixed-point accumulation is also the honest
    * 100 TB shape: a doubles-mean k-means is partition-order dependent and
    * unreproducible run-to-run.
    */
  private def kmeansStep(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("cv")))
      .select(col("cid"), col("pos"),
        floor(col("col").cast("double") * 1e6 + 0.5).cast("long").as("q"))
      .groupBy("cid", "pos")
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("cid"), col("pos"),
        (col("s").cast("double") / (col("n").cast("double") * 1e6))
          .cast("float").as("comp"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
        s => s.getField("comp")).as("centroid"))

  /** IVF (inverted-file) ANN — the second scale path, complementary to LSH:
    * `nCentroids` seed centroids (the nCentroids SMALLEST ids — rank-based,
    * so sparse or non-zero-based id spaces still seed fully) refined by
    * `kmeansIters` deterministic k-means iterations (each: broadcast
    * centroids → map-side argmax assignment → exact fixed-point mean, see
    * [[kmeansStep]]); every corpus vector assigned to its nearest final
    * centroid in ONE broadcast pass, and each query probing only its
    * `nProbe` nearest centroids' inverted lists before an exact re-rank.
    * At 100 TB: candidate scans touch ~nProbe/nCentroids of the corpus,
    * each k-means iteration is a linear scan + a tiny (k·dim) aggregate,
    * and the assignment can be written once and reused as a bucketed
    * layout keyed by `cid`.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 2,
      kmeansIters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val cent = refineCentroids(corpus, c, idCol, vecCol, nCentroids, kmeansIters)
    val assigned = assignToCentroids(c, cent, payload = Seq("cv"))
    probeIvf(cent, assigned, queries, idCol, vecCol, k, nProbe)
  }

  /** The `kmeansIters`-refined IVF centroids (seeded from the nCentroids
    * smallest ids — see [[ivfTopK]]).
    */
  private def refineCentroids(corpus: DataFrame, c: DataFrame, idCol: String,
      vecCol: String, nCentroids: Int, kmeansIters: Int): DataFrame = {
    var cent = corpus.select(col(idCol).as("cid"), col(vecCol).as("centroid"))
      .orderBy(col("cid")).limit(nCentroids)
    for (_ <- 0 until kmeansIters)
      cent = kmeansStep(assignToCentroids(c, cent, payload = Seq("cv")))
    cent
  }

  /** [[ivfTopK]]'s probe tail over an already-built (centroids, assignment)
    * pair — shared by the inline and index-backed paths so they cannot
    * drift.
    */
  private def probeIvf(cent: DataFrame, assigned: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame =
    probeIvfMulti(cent, Seq(assigned), queries, idCol, vecCol, k, nProbe)

  /** [[probeIvf]] over SEVERAL assigned relations (base bucketed table +
    * streamed delta epochs): each relation's candidate join is scored
    * SEPARATELY — so the bucketed base keeps its exchange-free join (a
    * pre-union would erase the bucket metadata, the h61 union lesson) and
    * the batch-sized delta joins pay only their own size — and the scored
    * candidates union into ONE shared top-k window (two-phase
    * WindowGroupLimit, same as the single-relation path).
    */
  private def probeIvfMulti(cent: DataFrame, assigned: Seq[DataFrame],
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("acos").desc, col("cid"))
    val probes = q.join(broadcast(cent))
      .withColumn("acos", cosine(col("qv"), col("centroid")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select("query_id", "qv", "cid")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    assigned.map { a =>
      probes.join(a, "cid")
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", Det.floorRound(cosine(col("qv"), col("cv")), 4))
        .select("query_id", "neighbor_id", "cos")
    }.reduce(_ unionByName _)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Persist the IVF structure as the write-once layout [[ivfTopK]]'s
    * scaladoc promises: the refined centroids as a tiny managed table and
    * the full corpus assignment (cid, neighbor_id, cv) as a BUCKETED,
    * bucket-sorted managed table keyed by `cid`
    * ([[graft.sources.Bucketing]]), so the k-means refinement and the
    * corpus-wide assignment pass are paid ONCE per corpus version and
    * every steady-state probe join arrives with the corpus side
    * pre-partitioned (no corpus-sized exchange — the h61 corpus-index
    * pattern applied to ANN; SimilaritySpec measures the shuffled-record
    * elimination). Returns (centroidsTable, assignmentTable).
    *
    * Bucket-count guidance at scale: one bucket ≈ one task (128–512 MB),
    * same as every bucketed layout here.
    */
  /** The epoch value [[buildIvfIndex]] and [[appendToIvfIndex]] stamp on
    * assignment rows that did NOT arrive through the streaming delta fold:
    * below every real streaming epoch id (Structured Streaming epochs are
    * ≥ 0), so the [[foldedEpochWatermark]] of a never-streamed table is
    * this sentinel and the first compaction folds everything.
    */
  private[graft] val NoEpoch = -1L

  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      tablePrefix: String, nCentroids: Int = 16, kmeansIters: Int = 2,
      buckets: Int = 8): (String, String) = {
    // clear() derives the stale-dir path as warehouse.dir/<table> — a
    // database-qualified or otherwise non-plain prefix would compute a
    // WRONG path (deleting an unrelated dir, or missing the stale one it
    // exists to remove), so restrict the prefix to a bare identifier in
    // the session's current (default) database
    require(tablePrefix.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"tablePrefix must be a plain unqualified identifier, got '$tablePrefix'")
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val cent = refineCentroids(corpus, c, idCol, vecCol, nCentroids, kmeansIters)
    val centTable = s"${tablePrefix}_ivf_centroids"
    val asgTable = s"${tablePrefix}_ivf_assignment"
    clearTable(spark, centTable)
    cent.write.mode("overwrite").format("parquet").saveAsTable(centTable)
    // persist the BUILD-TIME capacity on the table: kmeansStep drops
    // clusters that lose all members, so the live row count can shrink —
    // a later rebuildIvfIndex re-seeding from the live count would then
    // permanently shrink the index and break its bit-equal-to-cold-build
    // contract (round-18 review finding)
    spark.sql(s"ALTER TABLE $centTable SET TBLPROPERTIES " +
      s"('graft.ncentroids' = '$nCentroids')")
    clearTable(spark, asgTable)
    // the `epoch` column is the compaction high-watermark channel
    // ([[graft.streaming.StreamAnnIngest.compactDelta]]): rows folded from
    // the streaming delta keep their epoch id, everything else carries the
    // NoEpoch sentinel, and max(epoch) over the table IS the durable
    // "folded up to here" state — it commits atomically WITH the folded
    // rows (one write), which is what makes compaction retry-safe
    graft.sources.Bucketing.writeBucketed(
      assignToCentroids(c, spark.table(centTable), payload = Seq("cv"))
        .withColumn("epoch", lit(NoEpoch)),
      asgTable, bucketCols = Seq("cid"), buckets = buckets,
      sortCols = Seq("cid"))
    (centTable, asgTable)
  }

  /** Append a vector batch to a persisted [[buildIvfIndex]] layout WITHOUT
    * rebuilding: the batch is assigned against the FROZEN persisted
    * centroids (standard IVF maintenance — centroids refresh on a rebuild
    * cadence, not per batch, and the frozen-centroid assignment keeps the
    * layout deterministic) and appended through the SAME bucket spec, so
    * new rows land hash-bucketed by cid exactly like the originals (Spark
    * rejects a mismatched spec, so a wrong `buckets` fails loudly instead
    * of silently corrupting the layout). Cost: ONE broadcast-argmax pass
    * over the BATCH — corpus-size-independent, the h61 incremental-dedup
    * posture applied to ANN index maintenance.
    */
  def appendToIvfIndex(newVectors: DataFrame, idCol: String, vecCol: String,
      centroidsTable: String, assignmentTable: String,
      buckets: Int = 8): Unit =
    appendAssigned(
      assignToFrozenCentroids(newVectors, idCol, vecCol, centroidsTable)
        .withColumn("epoch", lit(NoEpoch)),
      assignmentTable, buckets)

  /** The ONE bucketed-append recipe for `(neighbor_id, cid, cv, epoch)`
    * rows into an assignment table — shared by [[appendToIvfIndex]] and
    * the delta compaction
    * ([[graft.streaming.StreamAnnIngest.compactDelta]]) so the layout the
    * serving path assumes cannot diverge between the two writers. Spark
    * rejects a `buckets` mismatch against the table's spec. Direct batch
    * appends stamp [[NoEpoch]]; compaction preserves each row's streaming
    * epoch id, which is what advances [[foldedEpochWatermark]].
    */
  private[graft] def appendAssigned(assigned: DataFrame,
      assignmentTable: String, buckets: Int): Unit =
    assigned.select("neighbor_id", "cid", "cv", "epoch")
      .write.mode("append")
      .bucketBy(buckets, "cid").sortBy("cid")
      .format("parquet").saveAsTable(assignmentTable)

  /** The highest streaming epoch already folded into `assignmentTable` —
    * `max(epoch)` over the table ([[NoEpoch]] when nothing streamed has
    * ever been folded, including the empty table). Because compaction
    * appends the folded rows WITH their epoch ids in one write, this
    * watermark and the folded data commit together: a compaction that
    * crashed after its append but before retiring the delta dirs is fully
    * recovered by simply re-running compaction (the re-run sees the
    * watermark, skips re-folding, and finishes the retire). Cost: a
    * column-pruned single-column scan of the table (Spark only answers a
    * bare `max` from parquet footer statistics when
    * `spark.sql.parquet.aggregatePushdown` is enabled, which it is not by
    * default) — a periodic-compaction price, not a serving-path one, but
    * size compaction cadence knowing it scales with the table.
    */
  def foldedEpochWatermark(spark: org.apache.spark.sql.SparkSession,
      assignmentTable: String): Long = {
    val r = spark.table(assignmentTable).agg(max(col("epoch"))).head()
    if (r.isNullAt(0)) NoEpoch else r.getLong(0)
  }

  /** The delta's row schema, derived from the assignment TABLE's schema
    * (the two are the same row shape by construction — both sides of
    * [[appendAssigned]]) rather than hardcoded: a corpus with non-bigint
    * ids or a different vector element type writes a delta this read then
    * handles with the exact types the base table carries. `epoch` is the
    * delta's PARTITION column (the [[graft.streaming.IdempotentSink]]
    * layout), declared explicitly so a footerless dir — an empty first
    * micro-batch — still reads (schema inference would crash on it).
    */
  private def deltaSchema(spark: org.apache.spark.sql.SparkSession,
      assignmentTable: String): org.apache.spark.sql.types.StructType = {
    val base = spark.table(assignmentTable).schema
    org.apache.spark.sql.types.StructType(
      Seq("neighbor_id", "cid", "cv").map(base.apply) :+ base.apply("epoch"))
  }

  /** The streamed delta relation under `deltaPath` — `(neighbor_id, cid,
    * cv, epoch)` rows across all landed epochs, with the row schema
    * derived from `assignmentTable` (see [[deltaSchema]]) so the read
    * works on every state the stream can leave behind: a missing dir
    * (never started / fully retired by compaction), a dir holding only
    * zero-row epochs, and any id/vector types the base table itself uses.
    */
  private[graft] def readDelta(spark: org.apache.spark.sql.SparkSession,
      deltaPath: String, assignmentTable: String): DataFrame = {
    val loc = new org.apache.hadoop.fs.Path(deltaPath)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = deltaSchema(spark, assignmentTable)
    if (fs.exists(loc))
      spark.read.schema(schema).parquet(deltaPath)
        .select("neighbor_id", "cid", "cv", "epoch")
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
  }

  /** [[readDelta]] restricted to an explicit list of `epoch=<id>` partition
    * directories — the compaction-side read: the fold operates on a
    * SNAPSHOT of the epochs it enumerated, so an epoch landed by a live
    * ingest between the enumeration and the fold is untouched (neither
    * read nor retired) instead of silently destroyed.
    */
  private[graft] def readDeltaEpochs(spark: org.apache.spark.sql.SparkSession,
      deltaPath: String, assignmentTable: String,
      epochDirs: Seq[String]): DataFrame =
    spark.read.option("basePath", deltaPath)
      .schema(deltaSchema(spark, assignmentTable))
      .parquet(epochDirs: _*)
      .select("neighbor_id", "cid", "cv", "epoch")

  /** The frozen-centroid assignment half of [[appendToIvfIndex]], exposed
    * for sinks that land the assigned rows elsewhere (the streaming delta
    * layout — [[graft.streaming.StreamAnnIngest]]): ONE broadcast-argmax
    * pass over the batch against the persisted centroids, returning
    * `(neighbor_id, cid, cv)` rows in the assignment-table schema.
    */
  def assignToFrozenCentroids(newVectors: DataFrame, idCol: String,
      vecCol: String, centroidsTable: String): DataFrame = {
    val spark = newVectors.sparkSession
    val c = newVectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    assignToCentroids(c, spark.table(centroidsTable), payload = Seq("cv"))
      .select("neighbor_id", "cid", "cv")
  }

  /** [[ivfTopKFromIndex]] over the bucketed base assignment PLUS a streamed
    * delta directory ([[graft.streaming.StreamAnnIngest]]'s
    * epoch-partitioned layout): the base join keeps its bucket-metadata
    * exchange elimination, the delta join pays only the delta's size, and
    * one shared window takes the combined top-k — the sealed-segments +
    * growing-segment serving shape of a streaming ANN deployment.
    */
  def ivfTopKFromIndexWithDelta(spark: org.apache.spark.sql.SparkSession,
      centroidsTable: String, assignmentTable: String, deltaPath: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2): DataFrame =
    // the serving path works on EVERY delta state — missing dir (before the
    // first epoch / after compaction retired it), zero-row epochs, or live
    // data — because readDelta never schema-infers. Base and delta must be
    // DISJOINT id sets (the ingest contract: new vectors stream, compaction
    // retires the dir it folded) — an overlapping row would occupy two
    // top-k slots.
    probeIvfMulti(spark.table(centroidsTable),
      Seq(graft.sources.Bucketing.readBucketed(spark, assignmentTable),
        readDelta(spark, deltaPath, assignmentTable)),
      queries, idCol, vecCol, k, nProbe)

  /** [[ivfTopK]] from a persisted [[buildIvfIndex]] layout: identical
    * output for the same parameters (same probe tail — shared code), but
    * steady-state cost only — no k-means, no assignment pass, and the
    * probe join's corpus side reads pre-partitioned from the bucketed
    * table.
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      centroidsTable: String, assignmentTable: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 2): DataFrame =
    probeIvf(spark.table(centroidsTable),
      graft.sources.Bucketing.readBucketed(spark, assignmentTable),
      queries, idCol, vecCol, k, nProbe)

  /** Staleness profile of a persisted [[buildIvfIndex]] layout — the
    * read-before-deciding diagnostic for the rebuild-vs-append question
    * [[appendToIvfIndex]]'s frozen-centroid contract raises (the h71
    * profile-the-knob pattern applied to index maintenance). Frozen
    * centroids are never "wrong" against themselves (argmax assignment is
    * self-consistent), so staleness is measured against a REFRESHED
    * centroid set: one exact fixed-point k-means step over the current
    * assignment ([[kmeansStep]] — precisely the centroids a rebuild's next
    * iteration would produce). Per cluster:
    *
    *   - `n` — current size (read the skew: one bloated cluster means its
    *     inverted list dominates probe cost);
    *   - `n_would_move` — members whose argmax against the refreshed
    *     centroids leaves the cluster (the assignment-churn a rebuild
    *     would perform; Σ n_would_move / Σ n is the headline migration
    *     rate);
    *   - `mean_own_q` / `mean_best_q` / `mean_gain_q` — micro-quantized
    *     mean cosine to the refreshed OWN centroid vs the refreshed BEST
    *     centroid, and the gap (how much assignment quality a rebuild
    *     buys, in 10⁻⁶ cosine units — integer sums then one `div`, so the
    *     numbers are partition-order-independent);
    *   - `centroid_cos_q` — cosine between the frozen centroid and its
    *     refreshed position (drift of the center itself; low values mean
    *     the appended mass pulled the cluster away from its frozen seed).
    *
    * Cost: ONE [[kmeansStep]] (corpus scan → (cid, dim)-keyed partial
    * aggregate, k·dim rows out) plus ONE assignment-shaped pass (broadcast
    * refreshed centroids, per-vector argmax combines map-side, one
    * vector-count-row exchange) — the same shape as the append it
    * adjudicates, so running the diagnostic per maintenance window is
    * always affordable. SimilaritySpec pins the numbers against a driver
    * replay; ScaleBench's `ivfdrift<N>x` mode reads this profile while
    * measuring the append-vs-rebuild recall/cost crossover.
    */
  def ivfStaleness(spark: org.apache.spark.sql.SparkSession,
      centroidsTable: String, assignmentTable: String): DataFrame = {
    val frozen = spark.table(centroidsTable)
    val asg = graft.sources.Bucketing.readBucketed(spark, assignmentTable)
      .select(col("cid"), col("neighbor_id"), col("cv"))
    val refreshed = kmeansStep(asg)
    val perVector = asg.select(col("neighbor_id"), col("cid").as("acid"), col("cv"))
      .join(broadcast(refreshed))
      .withColumn("acos", cosine(col("cv"), col("centroid")))
      .groupBy("neighbor_id")
      .agg(min(col("acid")).as("cid"),
        max_by(col("cid"), struct(col("acos"), (-col("cid")).as("t"))).as("best_cid"),
        floor(max(when(col("cid") === col("acid"), col("acos"))) * 1e6 + 0.5)
          .cast("long").as("own_q"),
        floor(max(col("acos")) * 1e6 + 0.5).cast("long").as("best_q"))
    val perCluster = perVector.groupBy("cid").agg(
      count(lit(1)).as("n"),
      sum((col("best_cid") =!= col("cid")).cast("long")).as("n_would_move"),
      sum(col("own_q")).as("__sum_own_q"),
      sum(col("best_q")).as("__sum_best_q"))
    val drift = frozen.select(col("cid"), col("centroid").as("__c0"))
      .join(refreshed.select(col("cid"), col("centroid").as("__c1")), "cid")
      .select(col("cid"),
        floor(cosine(col("__c0"), col("__c1")) * 1e6 + 0.5)
          .cast("long").as("centroid_cos_q"))
    perCluster.join(broadcast(drift), Seq("cid"), "left")
      .select(col("cid"), col("n"), col("n_would_move"),
        expr("__sum_own_q div n").as("mean_own_q"),
        expr("__sum_best_q div n").as("mean_best_q"),
        expr("(__sum_best_q - __sum_own_q) div n").as("mean_gain_q"),
        col("centroid_cos_q"))
  }

  /** Warm-start IVF rebuild: refresh a persisted [[buildIvfIndex]] layout
    * IN PLACE from its own current assignment, instead of the cold
    * rank-seeded rebuild. [[ivfStaleness]]'s refresh step (one exact
    * fixed-point [[kmeansStep]] over the current assignment) IS a rebuild's
    * next k-means iteration, so persisting that step as the new centroid
    * table plus ONE re-assignment pass advances the index exactly one
    * iteration from where it stands — bit-for-bit equal to a cold
    * [[buildIvfIndex]] with one more `kmeansIters` when nothing was
    * appended (SimilaritySpec pins this), and the warm-start answer to
    * frozen-centroid drift when batches WERE appended: the appended mass
    * participates in the step, unlike a cold rebuild's id-rank seeding
    * which restarts the refinement from scratch.
    *
    * Cost: one [[kmeansStep]] (corpus scan → (cid, dim)-keyed partial
    * aggregate) + one broadcast-argmax assignment pass + the bucketed
    * rewrite — the same corpus-proportional shape as a cold rebuild's
    * FINAL iteration alone, dropping the seed pass and all earlier
    * iterations (ScaleBench's `ivfdrift<N>x` measures the gap). Per-row
    * `epoch` values are preserved, so the compaction watermark
    * ([[foldedEpochWatermark]]) survives the refresh.
    *
    * Not transactional (the repo-wide non-ACID adjudication): the refresh
    * rewrites the centroid table, then stages the new assignment and swaps
    * it in via DROP + RENAME — run it in the maintenance window that also
    * runs compaction. A crash between the centroid overwrite and the swap
    * leaves refreshed centroids over the old assignment: still a
    * self-consistent serving state (cids are stable keys; recall shifts,
    * nothing corrupts), and re-running the refresh completes it. A crash
    * inside the DROP→RENAME swap window leaves the staged table under
    * `<assignmentTable>__refresh` with the base table gone — re-running
    * the refresh detects that state on entry and FINISHES the swap before
    * doing new work, so re-running is the recovery here too (the same
    * posture as [[graft.streaming.StreamAnnIngest.compactDelta]]); probes
    * hard-fail only inside the crash window itself, not until an operator
    * intervenes. Requires unique `neighbor_id`s (asserted loudly):
    * re-assignment groups by id, so duplicate rows — a double-folded
    * crash state or a batch appended twice — would be collapsed silently,
    * shrinking the table and possibly regressing the epoch watermark.
    *
    * Maintenance ordering with a streaming delta
    * ([[graft.streaming.StreamAnnIngest]]): COMPACT FIRST, THEN REFRESH —
    * delta rows are assigned against the centroids that were live at their
    * ingest, so refreshing under an uncompacted delta leaves the delta's
    * cid geometry stale relative to the refreshed probe selection (recall
    * drifts; nothing corrupts, and the watermark — carried on the rows —
    * survives the refresh either way, so later epochs keep folding
    * correctly; StreamingSpec pins the compact→refresh→ingest→compact
    * cycle).
    */
  def refreshIvfIndex(spark: org.apache.spark.sql.SparkSession,
      centroidsTable: String, assignmentTable: String): Unit =
    rewriteIvfIndex(spark, centroidsTable, assignmentTable)(kmeansStep)

  /** Cold IN-PLACE rebuild of a persisted [[buildIvfIndex]] layout: re-seed
    * from the k smallest `neighbor_id`s of the CURRENT assignment (k = the
    * BUILD-TIME `nCentroids`, read from the `graft.ncentroids` table
    * property buildIvfIndex stamps — NOT the live centroid-table row
    * count, which [[kmeansStep]] shrinks whenever a cluster loses all its
    * members: re-seeding from a shrunk live count would permanently lose
    * index capacity and silently break the bit-equal contract below; a
    * pre-property table falls back to the live count with a loud stderr
    * warning) and run the full `kmeansIters` refinement — the same
    * seed-then-iterate recipe as [[buildIvfIndex]], so on identical vector
    * content the rebuilt centroids and assignment are bit-equal to a cold
    * build's (SimilaritySpec pins this), EXCEPT that per-row `epoch` values
    * are preserved: a cold `buildIvfIndex` over re-extracted vectors would
    * stamp [[NoEpoch]] and silently reset the compaction watermark,
    * re-folding every retired streaming epoch on the next
    * [[graft.streaming.StreamAnnIngest.compactDelta]].
    *
    * This is the "cold rebuild" arm of the measured maintenance verdict
    * (BASELINE.md ivfdrift/ivftrip): the tool for ADVERSARIAL multi-modal
    * drift, where [[refreshIvfIndex]]'s single warm step chases a moving
    * blend — the rank re-seed re-fits the grown corpus cleanly at
    * `kmeansIters`× the refresh's scan cost. Shares [[refreshIvfIndex]]'s
    * swap machinery, so the crash-recovery posture (re-running finishes a
    * torn DROP→RENAME) and the duplicate-id guard are identical.
    */
  def rebuildIvfIndex(spark: org.apache.spark.sql.SparkSession,
      centroidsTable: String, assignmentTable: String,
      kmeansIters: Int = 2): Unit = {
    val live = spark.table(centroidsTable).count().toInt
    val k = builtNCentroids(spark, centroidsTable).getOrElse {
      System.err.println(s"[similarity] $centroidsTable carries no " +
        "graft.ncentroids property (pre-round-19 build?) — re-seeding from " +
        s"the LIVE centroid count $live; if clusters have emptied since the " +
        "build, the rebuilt index has LESS capacity than a cold build would")
      live
    }
    if (live < k)
      System.err.println(s"[similarity] $centroidsTable holds $live live " +
        s"centroids below its build capacity $k (emptied clusters) — " +
        s"re-seeding at the build capacity $k restores them")
    rewriteIvfIndex(spark, centroidsTable, assignmentTable) { asg =>
      var cent = asg.select(col("neighbor_id").as("cid"), col("cv").as("centroid"))
        .orderBy(col("cid")).limit(k)
      for (_ <- 0 until kmeansIters)
        cent = kmeansStep(
          assignToCentroids(asg.select(col("neighbor_id"), col("cv")), cent,
            payload = Seq("cv")))
      cent
    }
  }

  /** The shared rewrite core of [[refreshIvfIndex]] and [[rebuildIvfIndex]]:
    * crash-recover a torn swap, guard against duplicate ids, compute new
    * centroids from the current assignment via `newCentroids`, persist
    * them, re-assign every vector (epochs preserved), and swap the staged
    * bucketed table in. One body, so the two maintenance paths cannot
    * diverge on the recovery/guard/layout contract documented on
    * [[refreshIvfIndex]].
    */
  private def rewriteIvfIndex(spark: org.apache.spark.sql.SparkSession,
      centroidsTable: String, assignmentTable: String)(
      newCentroids: DataFrame => DataFrame): Unit = {
    val stage = s"${assignmentTable}__refresh"
    // crash recovery FIRST: a previous refresh that died inside its
    // DROP→RENAME swap left the staged table with the base table gone —
    // finish that swap before doing new work, so re-running the refresh is
    // the recovery and the no-base-table window closes itself. (A stage
    // leftover NEXT TO a live base table is pre-swap garbage; clearTable
    // below discards it.)
    if (!spark.catalog.tableExists(assignmentTable) &&
        spark.catalog.tableExists(stage))
      spark.sql(s"ALTER TABLE $stage RENAME TO $assignmentTable")
    // re-assignment groups by neighbor_id, which would SILENTLY collapse
    // duplicate ids (double-folded crash state, twice-appended batch) to a
    // non-deterministic survivor — shrinking the table and, if the dropped
    // row carried max(epoch), regressing the compaction watermark. Fail
    // loudly instead, like compactDelta's orphan guard.
    val Array(total, distinct) = spark.table(assignmentTable)
      .agg(count(lit(1)), count_distinct(col("neighbor_id")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    if (total != distinct)
      throw new IllegalStateException(
        s"$assignmentTable holds $total rows over $distinct distinct " +
          "neighbor_ids — duplicate ids would be collapsed " +
          "non-deterministically by the re-assignment; repair the table " +
          "(dedup by (neighbor_id, max epoch)) before refreshing")
    // the staged table must reproduce the table's OWN bucket layout — a
    // fixed parameter here would silently change the spec on a table built
    // with a different count, and the next appendAssigned/compactDelta
    // would then fail its spec check (the swap bypasses appendAssigned's
    // loud-mismatch safety because it creates a new table)
    val buckets = tableBuckets(spark, assignmentTable)
    val asg = graft.sources.Bucketing.readBucketed(spark, assignmentTable)
      .select(col("cid"), col("neighbor_id"), col("cv"), col("epoch"))
    // the new centroids read ONLY the assignment table, so overwriting the
    // centroid table is safe (refresh: one exact k-means step; rebuild:
    // rank re-seed + full refinement). saveAsTable(overwrite) recreates the
    // table, dropping its properties — re-stamp the build capacity so a
    // LATER rebuild can still restore emptied clusters.
    val builtK = builtNCentroids(spark, centroidsTable)
    newCentroids(asg).write.mode("overwrite").format("parquet")
      .saveAsTable(centroidsTable)
    builtK.foreach(k => spark.sql(s"ALTER TABLE $centroidsTable SET " +
      s"TBLPROPERTIES ('graft.ncentroids' = '$k')"))
    // re-assign every vector against the refreshed centroids into a staged
    // bucketed table (Spark cannot overwrite the table a plan reads), then
    // swap: DROP + RENAME keeps the bucket spec and moves the data dir
    clearTable(spark, stage)
    graft.sources.Bucketing.writeBucketed(
      assignToCentroids(asg.select(col("neighbor_id"), col("cv"), col("epoch")),
        spark.table(centroidsTable), payload = Seq("cv", "epoch")),
      stage, bucketCols = Seq("cid"), buckets = buckets,
      sortCols = Seq("cid"))
    spark.sql(s"DROP TABLE $assignmentTable")
    spark.sql(s"ALTER TABLE $stage RENAME TO $assignmentTable")
  }

  /** The bucket count of a bucketed table's own spec (DESCRIBE TABLE
    * EXTENDED "Num Buckets") — the ONE derivation every writer that must
    * reproduce an existing layout shares ([[rewriteIvfIndex]]'s staged
    * swap, [[graft.streaming.StreamAnnIngest.maintain]]'s compaction): a
    * fixed parameter would silently change the spec on a table built with
    * a different count and fail the next append's spec check.
    */
  private[graft] def tableBuckets(spark: org.apache.spark.sql.SparkSession,
      table: String): Int =
    spark.sql(s"DESCRIBE TABLE EXTENDED $table")
      .collect()
      .collectFirst { case r if r.getString(0) == "Num Buckets" =>
        r.getString(1).trim.toInt }
      .getOrElse(throw new IllegalStateException(
        s"$table is not bucketed — not a buildIvfIndex layout"))

  /** The build-time `nCentroids` stamped by [[buildIvfIndex]] as the
    * `graft.ncentroids` table property (None on a table written before the
    * property existed). [[rewriteIvfIndex]] re-stamps it across centroid
    * overwrites; [[rebuildIvfIndex]] re-seeds at it so emptied clusters
    * don't permanently shrink the index.
    */
  private[graft] def builtNCentroids(
      spark: org.apache.spark.sql.SparkSession,
      centroidsTable: String): Option[Int] =
    spark.sql(s"SHOW TBLPROPERTIES $centroidsTable")
      .collect()
      .collectFirst { case r if r.getString(0) == "graft.ncentroids" =>
        r.getString(1).trim.toInt }

  /** Drop `table` and clear its (possibly stale, cross-JVM) warehouse dir —
    * the in-memory catalog forgets tables across JVMs but the warehouse
    * directory persists, and a stale dir fails the next saveAsTable.
    */
  private def clearTable(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }

  /** Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the embedding
    * space with the same deterministic fixed-point k-means as [[ivfTopK]],
    * then drop any vector that has a LOWER-id near-duplicate (cosine ≥
    * `minCosine`) in its own cluster — the engine-portable stand-in for
    * SemDeDup's keep-one-representative rule (the paper keeps the item
    * farthest from the centroid; lowest-id is the deterministic,
    * oracle-replayable choice and keeps exactly one item per near-dup
    * chain's head).
    *
    * 100 TB posture: the all-pairs check runs WITHIN clusters only — the
    * whole point of clustering first — so pair count is Σ|cluster|², never
    * |corpus|²; nCentroids grows with the corpus to bound cluster sizes,
    * and the assignment pass is the same broadcast argmax as IVF (one
    * shuffle of (id, cid) rows). The centroids are exact fixed-point, so
    * the full construction — clusters included — replays in DuckDB.
    *
    * Output: (vec_id, cid, is_kept), one row per corpus vector.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nCentroids: Int = 16, kmeansIters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    var cent = corpus.select(col(idCol).as("cid"), col(vecCol).as("centroid"))
      .orderBy(col("cid")).limit(nCentroids)
    for (_ <- 0 until kmeansIters)
      cent = kmeansStep(assignToCentroids(c, cent, payload = Seq("cv")))
    val assigned = assignToCentroids(c, cent, payload = Seq("cv"))
    val a = assigned.select(col("cid"), col("neighbor_id").as("id_a"), col("cv").as("va"))
    val b = assigned.select(col("cid"), col("neighbor_id").as("id_b"), col("cv").as("vb"))
    val dups = a.join(b, "cid")
      .filter(col("id_a") < col("id_b"))
      .filter(Det.floorRound(cosine(col("va"), col("vb")), 4) >= minCosine)
      .select(col("id_b").as("dup_id")).distinct()
    assigned
      .join(dups, col("neighbor_id") === col("dup_id"), "left")
      .select(col("neighbor_id").as("vec_id"), col("cid"),
        col("dup_id").isNull.as("is_kept"))
  }

  /** Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    * ratio-margin rule CCMatrix mines bitext with): for every `src` vector
    * x, its best `tgt` match y is scored not by raw cosine but by the
    * MARGIN `cos(x,y) / ((avgₖNN(x,tgt) + avgₖNN(y,src)) / 2)` — dividing
    * by both sides' local similarity neighborhoods cancels the hubness
    * that makes raw-cosine mining precision collapse. A pair is flagged
    * `is_mutual` when y's best source is x back (mutual-best is the
    * high-precision mining setting).
    *
    * Determinism (oracle-exact end to end): the cosine is the same
    * sequentially-accumulated double as [[bruteForceTopK]] (bit-identical
    * to DuckDB's list_aggregate), quantized ONCE to 10⁻⁴ units
    * (`cq = floor(cos·10⁴ + 0.5)` as a long); the top-k sums are exact
    * integer sums of those units; and the margin is pure integer math —
    * `margin_q = (2·cq·nx·ny·10⁶) div (sx·ny + sy·nx)` with nx/ny the
    * actual neighbor counts (≤ k at corpus edges) — computed only when
    * numerator and denominator are positive (a negative-cosine best match
    * has no meaningful margin; NULL otherwise, same CASE in the oracle, and
    * positivity keeps trunc-vs-floor division agreement moot).
    *
    * 100 TB posture: each direction is ONE scored pass in the
    * [[bruteForceTopK]] shape — broadcast the opposite side, exact cosine
    * scan-side, and the `row_number ≤ k` filter plans as a two-phase
    * WindowGroupLimit, so each scan partition forwards ≤ k rows per vector
    * before the per-vector exchange. Everything after the two passes is
    * per-VECTOR-sized (one row per src/tgt), so the joins are tiny. At
    * real scale the exact scorer swaps for [[ivfTopK]]/[[lshTopK]] as the
    * candidate generator — the margin denominator needs exactly the top-k
    * lists an ANN pass emits — with identical downstream math; the exact
    * form here is the recall baseline, never all-pairs materialized
    * (nothing below ever holds more than k rows per vector past the scan).
    *
    * Output: one row per src vector —
    * (src_id, tgt_id, cos, margin_q, margin, is_mutual).
    */
  def marginMining(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int = 4): DataFrame = {
    require(k >= 1, s"neighborhood size k must be >= 1, got $k")
    val s = src.select(col(idCol).as("src_id"), col(vecCol).as("sv"))
    val t = tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("tv"))
    def scored = t.join(broadcast(s))
      .select(col("src_id"), col("tgt_id"),
        floor(cosine(col("sv"), col("tv")) * 1e4 + 0.5).cast("long").as("cq"))
    val wF = Window.partitionBy("src_id").orderBy(col("cq").desc, col("tgt_id"))
    val wB = Window.partitionBy("tgt_id").orderBy(col("cq").desc, col("src_id"))
    marginTail(
      scored.withColumn("rn", row_number().over(wF)).filter(col("rn") <= k),
      scored.withColumn("rn", row_number().over(wB)).filter(col("rn") <= k))
  }

  /** [[marginMining]]'s margin/mutual tail over ALREADY-BUILT top-k
    * neighbor relations — the decomposition that makes the "swap the exact
    * scorer for an ANN candidate generator at scale" posture runnable code.
    * `forward` holds, per src vector, its (up to k) best tgt neighbors as
    * `(src_id, tgt_id, rank, cos)` with rank 1 the best; `backward` the
    * same per tgt vector over src (same column names — `rank` there is the
    * per-tgt rank). Any generator emitting the [[bruteForceTopK]] output
    * contract fits after renaming `(query_id, neighbor_id)` to the side's
    * `(src_id, tgt_id)` roles — exact, [[ivfTopK]] or [[lshTopK]].
    *
    * The tail re-quantizes the 4-dp `cos` to the same 10⁻⁴ integer units
    * and replays [[marginMining]]'s exact integer margin chain, so exact
    * top-k inputs reproduce it bit-for-bit (SimilaritySpec pins that);
    * ANN-fed inputs differ only where the generator's recall differs —
    * margins stay comparable because the denominator uses each side's OWN
    * candidate neighborhood, mirroring how CCMatrix mines from faiss
    * top-k lists rather than exact ones.
    *
    * Output contract: margin_q, margin AND is_mutual are NULLABLE — a src
    * whose best tgt has no backward rows (an ANN generator probed only
    * empty buckets for that tgt) surfaces with all three NULL (tri-state
    * is_mutual: read with isNullAt / null-safe predicates, never a bare
    * getBoolean). Exact-fed inputs never produce the NULL rows (every tgt
    * has backward rows), so there the columns are effectively non-null.
    */
  def marginMiningFromTopK(forward: DataFrame, backward: DataFrame): DataFrame = {
    def quantized(df: DataFrame) = df.select(col("src_id"), col("tgt_id"),
      floor(col("cos") * 1e4 + 0.5).cast("long").as("cq"), col("rank").as("rn"))
    marginTail(quantized(forward), quantized(backward))
  }

  /** Shared margin math over the two pruned candidate relations
    * (`src_id`, `tgt_id`, `cq`, `rn` — ≤ k rows per vector): per-side top-k
    * sums/counts + best pair in ONE aggregate each, then the tiny
    * per-vector join computing the CASE-guarded integer margin.
    * [[marginMining]] and [[marginMiningFromTopK]] both delegate here, so
    * the exact and ANN-fed paths cannot drift.
    *
    * The backward aggregate joins LEFT: under an ANN-fed generator a tgt
    * whose probed buckets were all empty has no backward rows, and a src
    * whose best match is that tgt must still surface — with NULL margin_q /
    * margin / is_mutual (no neighborhood to normalize or reciprocate
    * against) rather than silently vanishing from the output. Exact-fed
    * inputs score every (src, tgt) pair, so the left join degenerates to
    * the old inner join there (every tgt has backward rows).
    */
  private def marginTail(f: DataFrame, b: DataFrame): DataFrame = {
    // per-src: top-k sum/count + the best pair, ONE aggregate pass
    val kx = f
      .groupBy("src_id")
      .agg(sum(col("cq")).as("sx"), count(lit(1)).as("nx"),
        min_by(struct(col("tgt_id"), col("cq")), col("rn")).as("best"))
      .select(col("src_id"), col("sx"), col("nx"),
        col("best.tgt_id").as("tgt_id"), col("best.cq").as("cq"))
    // per-tgt: top-k sum/count + the backward-best source
    val ky = b
      .groupBy("tgt_id")
      .agg(sum(col("cq")).as("sy"), count(lit(1)).as("ny"),
        min_by(col("src_id"), col("rn")).as("b_src"))
    val marginQ = expr(
      "CASE WHEN cq > 0 AND (sx * ny + sy * nx) > 0 " +
        "THEN CAST((2 * cq * nx * ny * 1000000) div (sx * ny + sy * nx) AS BIGINT) END")
    kx.join(ky, Seq("tgt_id"), "left")
      .withColumn("margin_q", marginQ)
      .select(col("src_id"), col("tgt_id"),
        (col("cq").cast("double") / 1e4).as("cos"),
        col("margin_q"),
        (col("margin_q").cast("double") / 1e6).as("margin"),
        (col("b_src") === col("src_id")).as("is_mutual"))
  }

  /** `nPlanes`-bit signature of a vector under one LSH table — the native
    * codegen'd graft.functions.HyperplaneSignature (bit-compatible with
    * [[lshSignatureHof]], asserted in SimilaritySpec).
    *
    * Hyperplanes are md5-derived ±1 Rademacher components and the dots are
    * exact fixed-point integer sums (see the expression's scaladoc), so the
    * whole construction is engine-portable — h9's DuckDB oracle replays it
    * bit-for-bit in SQL.
    */
  def lshSignature(vec: Column, table: Int, nPlanes: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.HyperplaneSignature(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), table, nPlanes))

  /** Reference HOF formulation of [[lshSignature]] (kept for the parity
    * test; nPlanes interpreted aggregates per row). The lambda touches only
    * its own zipped variable — no captured-expression recompute.
    */
  def lshSignatureHof(vec: Column, table: Int, nPlanes: Int): Column = {
    val q = zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
      struct(floor(x.cast("double") * 1e6 + 0.5).cast("long").as("q"),
        i.as("d")))
    val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bits = (0 until nPlanes).map { p =>
      val dot = aggregate(q, lit(0L), (acc, s) =>
        acc + when(
          substring(md5(concat(lit(s"$table:$p:"),
            s.getField("d").cast("string"))), 1, 1).isin(hi: _*),
          s.getField("q")).otherwise(-s.getField("q")))
      when(dot >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** ANN top-k via multi-table hyperplane LSH: bucket per table, exact
    * re-rank of in-bucket candidates, per-query top-k. Recall grows with
    * `nTables`; bucket size shrinks with `nPlanes`.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    def buckets(df: DataFrame, id: String, v: String) =
      (0 until nTables).map { t =>
        df.select(col(id), col(v),
          lit(t).as("table"), lshSignature(col(v), t, nPlanes).as("bucket"))
      }.reduce(_ unionByName _)
    val cb = buckets(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
      "neighbor_id", "cv")
    val qb = buckets(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv")
    val cand = cb.join(qb, Seq("table", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .distinct() // same pair may collide in several tables
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .withColumn("cos", Det.floorRound(cosine(col("qv"), col("cv")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
