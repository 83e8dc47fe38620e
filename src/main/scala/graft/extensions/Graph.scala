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

  /** Per-edge degree table over a canonical (a, b) edge list. */
  private[graft] def degrees(e: DataFrame): DataFrame =
    e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Degree-ordered orientation of a canonical (a, b) edge list: each edge
    * is rooted at its lower-(degree, id) endpoint — `src` points to the
    * endpoint with strictly greater (degree, id), carried alongside as the
    * comparable key `dkey = (degree, id)` of `dst`. Ties on degree fall
    * back to the id order, so the orientation is a total order and every
    * edge gets exactly one direction.
    *
    * This is the classic arboricity-bounded triangle refinement (Chiba &
    * Nishizeki '85; Cohen's MapReduce formulation, 2009): out-degree under
    * this orientation is O(√m) for ANY graph — a degree-10⁶ hub whose
    * neighbors are all degree-1 has out-degree 0, not 10⁶ — so the wedge
    * join below does Σ_v outdeg(v)² ≤ O(m·√m) work worst-case instead of
    * the Σ deg_hi(v)² of raw id-ordering, which a low-id hub turns
    * quadratic. Cost of the ordering: two node-table equi-joins to attach
    * endpoint degrees — graph-sized, never corpus-sized.
    */
  private[graft] def orientByDegree(e: DataFrame, deg: DataFrame): DataFrame = {
    val ka = struct(col("da").as("d"), col("a").as("i"))
    val kb = struct(col("db").as("d"), col("b").as("i"))
    e.join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      .select(
        when(ka < kb, col("a")).otherwise(col("b")).as("src"),
        when(ka < kb, col("b")).otherwise(col("a")).as("dst"),
        when(ka < kb, kb).otherwise(ka).as("dkey"))
  }

  /** Open wedges (x; v, w) of an oriented edge list: two out-edges of the
    * same root with key(v) < key(w) — the ONE self-equi-join on `src`. The
    * dkey ordering makes each unordered out-pair appear exactly once AND
    * guarantees the closing edge {v, w}, if present, is oriented v→w, so
    * one more equi-join on (src, dst) closes triangles.
    */
  private[graft] def orientedWedges(o: DataFrame): DataFrame =
    o.as("o1")
      .join(o.as("o2"),
        col("o1.src") === col("o2.src") && col("o1.dkey") < col("o2.dkey"))
      .select(col("o1.src").as("x"), col("o1.dst").as("v"), col("o2.dst").as("w"))

  /** Per-node triangle statistics: degree, triangle count, and local
    * clustering coefficient `2T / (deg·(deg-1))` (0 for degree-1 nodes),
    * 4-dp floor-rounded. High clustering inside a duplicate neighborhood
    * means a mutually-similar clique (template/boilerplate farm); low
    * clustering means chains of borderline pairs — different curation
    * actions for the same component size.
    *
    * Enumeration is the degree-ordered-orientation wedge join
    * ([[orientByDegree]]): orient every edge toward its higher-(degree, id)
    * endpoint, enumerate out-wedges with ONE self-equi-join on the root,
    * close with ONE more equi-join probing the (v, w) edge. Every triangle
    * is counted exactly once; no cartesian anywhere. The per-node counts
    * are enumeration-order-independent — identical to the id-ordered wedge
    * join the DuckDB oracle replays — pinned in Round9Spec alongside the
    * hub fixture showing the wedge-count collapse id-ordering can't give.
    *
    * 100 TB posture: wedge work is Σ_v outdeg(v)² with outdeg ≤ O(√m)
    * under the orientation (arboricity bound) — robust to the skewed
    * degree distributions a boilerplate-farm near-dup graph produces,
    * where a low-id hub made the previous id-ordered join's Σ deg_hi(v)²
    * quadratic. The two degree-attach joins this buys are graph-sized.
    */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // the edge list feeds THREE plan branches (degrees + the two degree-
    // attach joins of the orientation); without materialization each branch
    // would recompute the upstream pair construction (observed 7.4 s →
    // ~construction-once at sf0.1). localCheckpoint shares one computed RDD.
    // Lifecycle: blocks are session-owned until the RDD is GC'd (see the
    // labelPropagation scaladoc note) — query-per-session callers pay
    // nothing; long-lived services own their inputs' lifetime.
    val e = canonical(pairs, aCol, bCol).localCheckpoint(false)
    val deg = degrees(e)
    // the oriented list feeds three branches of its own (o1/o2 of the wedge
    // join + the closing probe); checkpoint it too — edge-count rows, and
    // the orientation joins then run once instead of three times
    val o = orientByDegree(e, deg).localCheckpoint(false)
    val tris = orientedWedges(o)
      .join(o.as("o3"), col("v") === col("o3.src") && col("w") === col("o3.dst"))
      .select(col("x"), col("v"), col("w"))
    val perNode = tris
      .select(explode(array(col("x"), col("v"), col("w"))).as("node"))
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
