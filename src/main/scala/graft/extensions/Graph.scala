package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over undirected pair lists — the near-dup pair graph
  * ([[Dedup.simhashNearDupPairs]], [[Dedup.verifiedNearDupPairs]]) is the
  * motivating input, where per-node structure drives corpus curation:
  * propagating trusted labels through duplicate neighborhoods, and telling
  * boilerplate farms (dense, high-clustering duplicate cliques) from chance
  * pairings (isolated edges).
  *
  * The reference pipeline has no graph stage (its dedup is a single
  * drop_duplicates, `/root/reference/data_processing.py:380`); these extend
  * the same duplicate-analysis family as [[Dedup.connectedComponents]] /
  * [[Dedup.pageRank]]. Like those, every op here is a fixed, finite plan of
  * equi-joins + aggregates — deterministic in any engine, so DuckDB oracles
  * replay them exactly.
  */
object Graph {

  /** Canonical undirected edge list: (a,b)/(b,a)/duplicate rows collapse to
    * one least/greatest row, self-pairs drop. Same defensive hygiene as
    * [[Dedup.pageRank]] — a no-op on already-canonical pair lists.
    */
  private def canonical(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs
      .select(least(col(aCol), col(bCol)).as("a"), greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Semi-supervised label propagation: spread `seeds` labels (e.g. a
    * human-audited quality tier, or trusted source tags) across the
    * near-dup graph for `iterations` rounds. Each round, every node with at
    * least one labeled neighbor takes the most frequent neighbor label
    * (ties → lexicographically smallest label); seed nodes never change.
    * Deterministic by construction — votes are integer counts and the
    * tiebreak is total — so every engine agrees bit-for-bit.
    *
    * Output: (node, label, is_seed) for every node labeled after the final
    * round. Unreached nodes (no labeled node within `iterations` hops) and
    * isolated docs (no edges) are absent by design.
    *
    * 100 TB posture: per round, ONE equi-join of edges against the current
    * label set on src (labels shuffle once onto the edge partitioning), one
    * partial-aggregated (dst, label) count — shuffle volume bounded by
    * distinct labels per node, not edge count — and a per-dst rank-1 window
    * that plans as a two-phase WindowGroupLimit (each map partition forwards
    * one candidate row per (dst,label)). k rounds = k bounded shuffle
    * chains, the [[Dedup.pageRank]] stage discipline; for long chains,
    * localCheckpoint per round would truncate lineage the same way.
    *
    * Storage lifecycle: the canonical edge list is localCheckpoint'd (lazy)
    * so the k rounds share ONE computed pair construction. The checkpoint
    * blocks belong to the SparkSession and are NOT freed when the returned
    * DataFrame is dropped — they are reclaimed when the session stops or
    * when the checkpointed RDD becomes unreachable and the ContextCleaner
    * collects it. Fine for query-per-session use (Bench/Verify); a
    * long-lived service calling this repeatedly should bound its own edge
    * inputs' lifetime (same caller-owns-the-cache posture as
    * [[Dedup.connectedComponents]]).
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
      seeds: DataFrame, nodeCol: String, labelCol: String,
      iterations: Int = 2): DataFrame = {
    // every round re-reads the edge list — localCheckpoint materializes the
    // (possibly expensive) upstream pair construction ONCE instead of once
    // per round (eager=false: the first action computes it; the h23 pattern)
    val edgesCanon = canonical(pairs, aCol, bCol).localCheckpoint(false)
    val edges = edgesCanon.select(col("a").as("src"), col("b").as("dst"))
      .union(edgesCanon.select(col("b").as("src"), col("a").as("dst")))
    val seed = seeds.select(col(nodeCol).as("node"), col(labelCol).as("label"))
    var labels = seed.withColumn("is_seed", lit(true))
    for (_ <- 1 to iterations) {
      val votes = edges
        .join(labels.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy("dst")
        .orderBy(col("votes").desc, col("label").asc)
      val winner = votes
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("dst").as("node"), col("label"))
      labels = seed.withColumn("is_seed", lit(true))
        .unionByName(
          winner.join(seed.select("node"), Seq("node"), "left_anti")
            .withColumn("is_seed", lit(false)))
    }
    labels
  }

  /** Per-node triangle statistics: degree, triangle count, and local
    * clustering coefficient `2T / (deg·(deg-1))` (0 for degree-1 nodes),
    * 4-dp floor-rounded. High clustering inside a duplicate neighborhood
    * means a mutually-similar clique (template/boilerplate farm); low
    * clustering means chains of borderline pairs — different curation
    * actions for the same component size.
    *
    * Enumeration is the standard id-ordered wedge join: canonical a<b edges,
    * wedges (a,b,c) with a<b<c from ONE self-equi-join on the middle node,
    * closed by ONE more equi-join probing (a,c). Every triangle is counted
    * exactly once; no cartesian anywhere.
    *
    * 100 TB posture: wedge count is Σ_v deg_hi(v)² over the HIGHER-id
    * adjacency — on a near-dup graph (small fraction of the corpus, bounded
    * component sizes by LSH construction) this is modest; at adversarial
    * scale the standard refinement is degree-ordered orientation (root each
    * edge at the lower-degree endpoint, bounding wedge work by arboricity)
    * — same plan shape, different ordering key, noted here because the
    * id-ordering is what makes the oracle replay exact.
    */
  /** Weighted PageRank over an undirected weighted pair list — for the
    * near-dup graph, edge weight = similarity strength (e.g. `maxHamming+1
    * − hamming` from [[Dedup.simhashNearDupPairs]]), so authority flows
    * preferentially through CLOSER duplicates and the canonical-doc choice
    * weighs exact copies above borderline pairs ([[Dedup.pageRank]] treats
    * both alike).
    *
    * Same exact-arithmetic discipline as the unweighted form: integer
    * micro-unit scores, per-edge contribution `(score·w) div wdeg` an exact
    * integer division, order-independent integer sums, ONE IEEE damping
    * multiply per node per round — every engine replays it bit-for-bit.
    * Input hygiene: pairs canonicalize via least/greatest, self-pairs drop,
    * duplicate rows collapse keeping the max weight; weights must be
    * positive integers.
    *
    * 100 TB posture: identical stage shape to [[Dedup.pageRank]] — per
    * iteration one equi-join of edges⋈scores on src (weighted degree rides
    * the edge rows) and one partial-aggregated shuffle on dst; no
    * localCheckpoint for the same ReuseExchange/AQE-stats reason noted
    * there.
    */
  def weightedPageRank(pairs: DataFrame, aCol: String, bCol: String,
      wCol: String, iterations: Int = 3): DataFrame = {
    val canon = pairs
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"), col(wCol).cast("long").as("w"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b").agg(max("w").as("w"))
    val edges = canon.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .union(canon.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val wdeg = edges.groupBy("src").agg(sum("w").as("wdeg"))
    val withDeg = edges.join(wdeg, "src")
    var scores = wdeg.select(col("src").as("node"), lit(1000000L).as("score"))
    for (_ <- 1 to iterations) {
      val contrib = withDeg.join(scores, col("src") === col("node"))
        .select(col("dst"), expr("(score * w) div wdeg").as("c"))
      scores = contrib.groupBy("dst").agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(150000L) +
            floor(lit(0.85) * col("s").cast("double")).cast("long")).as("score"))
    }
    scores.select(col("node"), col("score").as("wpr_micro"),
      (col("score").cast("double") / 1000000.0).as("weighted_pagerank"))
  }

  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // the edge list feeds FOUR plan branches (degrees + e1/e2/e3 of the
    // wedge join); without materialization each branch would recompute the
    // upstream pair construction (observed 7.4 s → ~construction-once at
    // sf0.1). localCheckpoint shares one computed RDD across all branches.
    // Lifecycle: blocks are session-owned until the RDD is GC'd (see the
    // labelPropagation scaladoc note) — query-per-session callers pay
    // nothing; long-lived services own their inputs' lifetime.
    val e = canonical(pairs, aCol, bCol).localCheckpoint(false)
    val deg = e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tris = wedges
      .join(e.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"))
      .select(col("x"), col("y"), col("z"))
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") < 2, lit(0.0))
          .otherwise(Det.floorRound(
            lit(2.0) * coalesce(col("triangles"), lit(0L)).cast("double") /
              (col("degree").cast("double") * (col("degree") - 1).cast("double")),
            4))
          .as("clustering"))
  }
}
