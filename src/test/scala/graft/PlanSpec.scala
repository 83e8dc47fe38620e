package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan regression suite: the properties that make these queries
  * scale — filter/column pushdown into the parquet scan, broadcast joins for
  * small dims, TakeOrderedAndProject for top-k, partial aggregation, native
  * codegen'd expressions — asserted on the executed plans so a refactor
  * cannot silently trade them away. (These are the `.explain("formatted")`
  * checks from the build plan, pinned as tests.)
  */
class PlanSpec extends SparkSpec {

  private def qdf(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  private def planStr(df: DataFrame): String = {
    // collect() executes THIS QueryExecution (a write would plan a separate
    // one), so AdaptiveSparkPlanExec.executedPlan below is the FINAL plan
    // AQE actually ran, not the initial static plan
    df.collect()
    val p = df.queryExecution.executedPlan
    val fin = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    fin.toString + "\n" + df.queryExecution.optimizedPlan.toString
  }

  test("e1 (TPC-H Q1 shape): shipdate filter and 7-col projection push into the scan") {
    val p = planStr(qdf("e1_groupby_sum_avg"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(p.contains("ReadSchema"), p)
    // pruned: no l_orderkey/l_comment in the scan schema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey"), readSchema)
    // partial + final aggregation
    assert(p.contains("HashAggregate"), p)
  }

  test("a1: column pruning reaches the scan (4 of 16 lineitem columns read)") {
    val p = planStr(qdf("a1_project_prune"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"), readSchema)
  }

  test("d2: small dim join is a BroadcastHashJoin (no shuffle of the fact side)") {
    val p = planStr(qdf("d2_broadcast_dim"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("d6: multiway star join broadcasts every small dim") {
    val p = planStr(qdf("d6_multiway_star"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("f4: order+limit compiles to TakeOrderedAndProject (no global sort)") {
    val p = planStr(qdf("f4_order_limit"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("h2: query set is broadcast; cosine_sim is the native expression") {
    val p = planStr(qdf("h2_cosine_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("cosine_sim"), p)
  }

  test("h2: top-k is two-phase — partial WindowGroupLimit before the shuffle") {
    // InferWindowGroupLimit rewrites the row_number<=k filter into a map-side
    // (Partial) group limit + reduce-side (Final) limit: each map partition
    // forwards at most k rows per query, so the per-query reducer sorts
    // ≤ k·P rows, never the whole scored corpus. This is the property that
    // keeps brute-force scoring usable as an exact baseline at scale.
    val p = planStr(qdf("h2_cosine_topk"))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
    assert(p.contains("Final"), p)
  }

  test("h65: pagerank iterations stay equi-join + partial agg (no cartesian)") {
    // each of the 3 unrolled iterations must be an equi-join of edges with
    // the previous scores plus a partial-aggregated contribution sum on dst;
    // a CartesianProduct or BroadcastNestedLoopJoin would mean a join
    // condition degenerated, and a missing partial_sum would push whole
    // score rows through every exchange
    val p = planStr(qdf("h65_dup_graph_pagerank"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("h69: matryoshka prefilter is broadcast + native cosine + two-phase group limit") {
    // the 16-dim prefilter must keep the h2 scale contract: broadcast query
    // set, codegen'd cosine_sim, and a map-side Partial WindowGroupLimit so
    // each partition forwards <= m rows per query before the exchange
    val p = planStr(qdf("h69_matryoshka_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("cosine_sim"), p)
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("h66/h67: near-dup graph analytics stay equi-join + partial agg (no cartesian)") {
    // label votes and wedge enumeration must plan as equi-joins with
    // partial-aggregated counts; a CartesianProduct would mean a join key
    // degenerated (the wedge join's all-pairs failure mode)
    for (q <- Seq("h66_label_propagation", "h67_dup_graph_triangles")) {
      val p = planStr(qdf(q))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"$q\n$p")
      assert(p.contains("partial_count"), s"$q\n$p")
    }
  }

  test("h70: fingerprint XOR combines map-side before ONE exchange") {
    // the whole fingerprint must be scan projection + partial bit_xor/count
    // + one hash exchange on the group key — shuffle rows = group count,
    // not corpus rows
    val p = planStr(qdf("h70_dataset_fingerprint"))
    assert(p.contains("partial_bit_xor") || p.contains("partial_count"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected <=1 exchange, got $exchanges\n$p")
  }

  test("h71: heavy-key top-k is TakeOrderedAndProject over a partial-aggregated count") {
    val p = planStr(qdf("h71_heavy_key_profile"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p)
  }

  test("h72: decile assignment broadcasts the boundary row; bin agg is partial") {
    // the corpus-sized side must never shuffle for the assignment — the
    // 1-row boundary array broadcasts onto a scan-side projection; the only
    // per-row aggregates are the partial bin/decile counts
    val p = planStr(qdf("h72_length_deciles"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("h73: SCD2 merge is ONE key join + generate — no second join, no window") {
    // the merge must be a single full-outer equi-join on the business key
    // followed by a codegen'd array+explode emit: exactly the dim-side and
    // update-side exchanges, no re-join of the emitted rows, no window
    val p = planStr(qdf("h73_scd2_merge"))
    assert(p.contains("FullOuter") || p.contains("full_outer"), p)
    assert(p.contains("Generate explode"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("h74: fuzzy linkage is a block-key equi-join, never a cross product") {
    // the Σ|block|² contract: candidates come from an equi-join on the
    // blocking key with the levenshtein verify on the joined stream
    val p = planStr(qdf("h74_blocked_fuzzy_match"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("levenshtein"), p)
  }

  test("h75: sketch cells broadcast to the probes; aggregates are partial") {
    // the d·w-cell sketch must broadcast (it is corpus-size-independent) and
    // both the cell build and the top-k count must combine map-side
    val p = planStr(qdf("h75_count_min_hitters"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("h76: z-order stats are a scan-side projection + ONE partial-agg exchange") {
    // the z-value and file assignment are pure projections; the only
    // shuffle is the per-file stats aggregate
    val p = planStr(qdf("h76_zorder_layout"))
    assert(p.contains("partial_count") || p.contains("partial_min"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected <=1 exchange, got $exchanges\n$p")
  }

  test("h77: snapshot diff joins 16-byte hash rows — content cols never reach the join") {
    // both sides must reduce to (key, fp) scan-side; the full-outer join
    // carries no text/lang/source columns
    val p = planStr(qdf("h77_snapshot_diff"))
    assert(p.contains("FullOuter") || p.contains("full_outer"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val joinLine = p.linesIterator.find(l => l.contains("SortMergeJoin") && l.contains("FullOuter"))
    joinLine.foreach(l => assert(!l.contains("text#"), l))
  }

  test("h78: weighted pagerank iterations stay equi-join + partial agg (no cartesian)") {
    val p = planStr(qdf("h78_weighted_pagerank"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("h79: chi-square never re-touches corpus rows after the first cell aggregate") {
    // marginals and the grand total re-aggregate the CELL table; the 1-row
    // total broadcasts; the final window runs over cell-cardinality rows
    val p = planStr(qdf("h79_chi_square"))
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("h80: basket pairs come from a basket-id equi-join; top-k is TakeOrdered") {
    val p = planStr(qdf("h80_basket_lift"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p)
  }

  test("h81: point-in-time lookup is an EQUI-join on the key (date window filters the stream)") {
    // the version-window predicate must ride the key equi-join as a
    // post-condition, never degrade the join to a range cross product
    val p = planStr(qdf("h81_scd2_lookup"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("h82/h84: sequence + retention stay partial-agg after the per-user reduction") {
    for (q <- Seq("h82_markov_transitions", "h84_retention_cohorts")) {
      val p = planStr(qdf(q))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
      assert(p.contains("partial_count") || p.contains("partial_sum"), s"$q\n$p")
    }
  }

  test("h83: top paths end in TakeOrderedAndProject (no global sort of the path table)") {
    val p = planStr(qdf("h83_top_paths"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("h85: two-step SCD2 evolution stays two key joins + generates — no window, no cartesian") {
    val p = planStr(qdf("h85_scd2_evolution"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
    val fullOuters = "FullOuter".r.findAllIn(p).size
    assert(fullOuters >= 2, s"expected both merge joins in the plan\n$p")
  }

  test("h86: binned interval-overlap join plans equi, never nested-loop") {
    val p = planStr(qdf("h86_interval_overlap"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the bucket equi-join must survive (broadcast of the tiny window side
    // or SMJ at scale — either is an equi join on __bucket)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("e14: unpivot plans as a single Expand projection, no extra exchange") {
    val p = planStr(qdf("e14_unpivot_metrics"))
    assert(p.contains("Expand"), p)
    // one aggregate exchange (partial+final) plus the final sort — the
    // reshape itself must not shuffle
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d8: lateral top-k decorrelates to one equi join + rank — no per-row re-execution") {
    val p = planStr(qdf("d8_lateral_topk"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window") || p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("h88: streak windows all reuse the per-user partitioning after ONE distinct") {
    val p = planStr(qdf("h88_activity_streaks"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // distinct (user, day) is the only corpus-sized exchange; the window
    // and island aggregate run on the same user_id hash partitioning
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected user-partitioning reuse, got $exchanges hash exchanges\n$p")
  }

  test("h63: bag fingerprint aggregates partially before ONE hash exchange") {
    // the cluster-stats aggregate must combine map-side and shuffle on the
    // uniform fingerprint exactly once; the disposition join may broadcast
    // (small scale) or reuse the bag_fp partitioning (real scale), but a
    // second hashpartitioning exchange on bag_fp would mean the join
    // re-shuffled what the aggregate already partitioned.
    val p = planStr(qdf("h63_bag_dedup"))
    assert(p.contains("partial_count"), p)
    val fpExchanges = "hashpartitioning\\(bag_fp".r.findAllIn(p).size
    assert(fpExchanges <= 1, s"expected <=1 bag_fp exchange, got $fpExchanges\n$p")
  }

  test("h64: hard negatives broadcast the query set and run the two-phase group limit") {
    // the label-mismatch predicate must ride the broadcast join (culling in
    // the scoring stage), and the top-k must again be Partial WindowGroupLimit
    // before the query_id exchange — same scale contract as h2.
    val p = planStr(qdf("h64_hard_negatives"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("cosine_sim"), p)
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
  }

  test("h15: IVF final re-rank also runs the two-phase group limit") {
    val p = planStr(qdf("h15_ivf_ann_topk"))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
  }

  test("e8: correlated scalar subquery is decorrelated (no per-row subquery)") {
    val p = planStr(qdf("e8_correlated_scalar_subquery"))
    // the rewrite turns the correlated aggregate into a grouped aggregate
    // joined on l_partkey; a surviving scalar-subquery node would mean
    // per-outer-row execution
    assert(!p.contains("ScalarSubquery"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("e9: IN-subqueries become semi joins, not per-row probes") {
    val p = planStr(qdf("e9_in_subquery"))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("InSubquery"), p)
  }

  test("h5: minhash signature is per-row scan-side — no aggregate, no sort") {
    val p = planStr(qdf("h5_minhash_lsh_pairs"))
    // round 22: the signature is the native minhash_signature expression in
    // the scan (per-row — the retired min-over-strings aggregate was a
    // SortAggregate, sorting the corpus-shingle relation around a full
    // exchange), and the banded rows ride ONE localCheckpoint that both
    // self-join sides read (the ExistingRDD scans)
    assert(!p.contains("SortAggregate"), p)
    assert(p.contains("ExistingRDD"), p)
  }

  test("h18 as-of join: one window pass, no range cross-product operators") {
    val p = planStr(qdf("h18_asof_purchase_click"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("h20 banded range join: equi-join on buckets, no cross product") {
    val p = planStr(qdf("h20_point_in_session_range_join"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("events loader: ts conversion does not break scan batching") {
    val p = planStr(Tables.events(spark, sf))
    assert(p.contains("Batched: true"), p)
  }

  test("h42 chunking is scan-side: explode stays in the scan stage, no agg/join shuffle") {
    val p = planStr(qdf("h42_context_chunks"))
    assert(p.contains("Generate"), p) // sequence+explode in the scan stage
    // the only exchange is the contract ORDER BY's range partitioning —
    // a hash exchange would mean chunking itself started shuffling
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"), p)
  }

  test("h43 packing has no global-order window: partitioned by shard, never SinglePartition") {
    // the scale property of packBins: a row_number over a global ORDER BY
    // would plan Exchange SinglePartition and funnel the corpus through one
    // reducer; the md5 shard keeps the window partitioned
    val p = planStr(qdf("h43_sequence_packing"))
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(shard"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("h44 span dedup: one window pass selects winners, no cross product") {
    val p = planStr(qdf("h44_span_dedup"))
    // round 22: winner selection is a single window min over the span
    // fingerprint — the retired min(struct) aggregate (a SortAggregate)
    // plus join-back computed the span relation twice
    assert(p.contains("Window"), p)
    assert(!p.contains("SortAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("h110 staleness profile: bucketed kmeans scan, map-side argmax, two exchanges") {
    val p = planStr(qdf("h110_ivf_staleness"))
    // the per-vector argmax combines map-side before its exchange — the
    // property that keeps the profile assignment-shaped, not cross-sized
    assert(p.contains("partial_max_by"), p)
    // refreshed centroids broadcast (the deliberate 16-row crossjoin);
    // nothing corpus-sized funnels through one partition
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SinglePartition"), p)
    // exactly TWO hash exchanges: one row per vector to finish the argmax,
    // nCentroids rows to finish the per-cluster stats — the kmeansStep
    // (cid, pos) aggregate rides the assignment table's bucket metadata
    // with NO exchange of its own
    assert("hashpartitioning\\(".r.findAllIn(p).size === 2, p)
  }

  test("h110 assignment cross: the CENTROID side is the broadcast build side, never the corpus") {
    // the two-exchange pin above tolerates BroadcastNestedLoopJoin by
    // construction (the deliberate nCentroids-row broadcast cross IS a
    // BNLJ) — this pins WHICH side is broadcast, so a refactor cannot
    // silently flip the sides and broadcast the corpus: the build side
    // must be the kmeansStep REDUCTION (an aggregate → ≤ nCentroids rows),
    // and the streamed side must be the raw assignment scan with no
    // aggregate between scan and join
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    val df = qdf("h110_ivf_staleness")
    df.collect()
    val top = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    // AQE wraps materialized subtrees in QueryStageExec leaves; descend
    // through them (and reused exchanges) so collect sees the whole tree
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case q: QueryStageExec     => walk(q.plan)
        case r: ReusedExchangeExec => walk(r.child)
        case _                     => p.children.flatMap(walk)
      })
    def hasAgg(p: SparkPlan): Boolean =
      walk(p).exists(_.isInstanceOf[BaseAggregateExec])
    val bnljs = walk(top).collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnljs.nonEmpty, s"expected the broadcast assignment cross:\n$top")
    for (j <- bnljs) {
      val (build, streamed) =
        if (j.buildSide == BuildRight) (j.right, j.left) else (j.left, j.right)
      assert(hasAgg(build),
        s"broadcast build side is not the centroid reduction:\n$j")
      assert(!hasAgg(streamed),
        s"streamed side carries an aggregate — the sides flipped:\n$j")
    }
  }

  test("h109 substring dedup: one doc-keyed exchange for the island tail; winner agg partial") {
    val p = planStr(qdf("h109_substring_dedup"))
    // winner = groupBy(anchor fp).min(struct) with map-side combine
    assert(p.contains("partial_min"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // both island-merge windows are doc-partitioned, never a global window
    assert(p.contains("windowspecdefinition(doc_id"), p)
    assert(!p.contains("SinglePartition"), p)
    // the interval-merge windows AND the two span aggregates all ride ONE
    // hashpartitioning(doc_id) exchange of loser rows (subset-key
    // co-location) — a second doc exchange means the tail re-shuffled
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).size === 1, p)
  }

  test("h47/h49 LM and entropy: partial aggregation, no cross products beyond 1-row totals") {
    for (q <- Seq("h47_bigram_lm_score", "h49_token_entropy")) {
      val p = planStr(qdf(q))
      assert(p.contains("partial_sum") || p.contains("partial_count"), s"$q:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      // h47's (doc, bigram) aggregate rides a checkpoint since round 22
      // (its explode is inside the ExistingRDD scan); h49's explode stays
      // visibly scan-side
      assert(p.contains("Generate") || p.contains("ExistingRDD"), s"$q:\n$p")
    }
  }

  test("h45 throttle: groupBy-min keep, no window materialization of duplicate groups") {
    val p = planStr(qdf("h45_stream_dedup_throttle"))
    assert(p.contains("partial_min"), p) // map-side combine on the keep
    assert(!p.contains("WindowGroupLimit") && !p.contains("row_number"), p)
  }

  test("h48 PMI: unigram count table broadcasts and is REUSED across both word joins") {
    val p = planStr(qdf("h48_pmi_collocations"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("ReusedExchange"), p) // c1/c2 share one broadcast
    assert(p.contains("TakeOrderedAndProject"), p) // top-k, no global sort
  }

  test("partitioned write + partition filter prunes at the scan (no full-data read)") {
    // the layout property the curated zone relies on at 100 TB: a filter on
    // the partition column must become PartitionFilters on the scan, not a
    // post-scan Filter over every partition
    val scratch = "target/scratch/planspec_prune"
    Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(scratch)
    val df = spark.read.parquet(scratch)
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val p = planStr(df)
    assert(p.contains("PartitionFilters: [isnotnull(event_type"), p)
    assert(p.contains("event_type#") && p.contains("= click"), p)
  }

  test("h51 BM25: postings agg is partial, df/stats broadcast, top-k is TakeOrderedAndProject") {
    val p = planStr(qdf("h51_bm25_topk"))
    assert(p.contains("TakeOrderedAndProject"), p) // never a global sort for top-k
    assert(p.contains("BroadcastHashJoin"), p)     // |queryTerms|-row df table broadcasts
    assert(!p.contains("CartesianProduct"), p)     // (1-row stats joins via BNLJ broadcast — fine)
    assert(p.contains("Generate"), p)              // explode stays scan-side
    assert(p.contains("partial_count") || p.contains("Partial"), p)
  }

  test("h54 hybrid RRF: dense pool is two-phase group-limited, fusion top-k never global-sorts") {
    val p = planStr(qdf("h54_hybrid_rrf"))
    assert(p.contains("WindowGroupLimit"), p)       // dense top-pool pre-limited per partition
    assert(p.contains("TakeOrderedAndProject"), p)  // fused top-k
  }

  test("f9 range frame: a real RangeFrame window, one pass, no cross product") {
    val p = planStr(qdf("f9_range_frame"))
    assert(p.contains("RangeFrame"), p)
    assert(p.contains("hashpartitioning(user_id"), p) // window shuffles on user, not global
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("e13: EXISTS becomes a semi join, NOT EXISTS an anti join — no per-row probes") {
    val p = planStr(qdf("e13_exists_subquery"))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("h53 stream-static enrich: dim side is a BroadcastHashJoin build") {
    val p = planStr(qdf("h53_stream_static_enrich"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("h55 DSIR: ratio table broadcasts back, LM agg partial, one histogram build") {
    val p = planStr(qdf("h55_dsir_weights"))
    assert(p.contains("BroadcastHashJoin"), p)  // ≤4096-row ratio table
    assert(!p.contains("CartesianProduct"), p)  // (1-row totals joins via BNLJ — fine)
    // round 22: the per-doc bucket histogram is the native
    // token_bucket_counts expression behind ONE localCheckpoint (the
    // ExistingRDD scans) — the corpus-token explode + (doc,bucket)
    // aggregate exchange is gone, and the three consumers read one
    // materialization instead of re-running the chain
    assert(p.contains("ExistingRDD"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("h56 semdedup: within-cluster pairing is an equi-join on cid, never a corpus cross product") {
    val p = planStr(qdf("h56_semdedup"))
    // the ONLY nested-loop joins are the broadcast centroid table
    // (nCentroids rows) against the corpus — the pair join itself must
    // hash/merge on cid
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("h60 DSIR resample: Gumbel top-k is TakeOrderedAndProject, no global sort") {
    val p = planStr(qdf("h60_dsir_resample"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p) // 1-row totals via BNLJ only
  }

  test("h61 incremental dedup: bucket/verify joins are equi, exact layer is anti-join, no cross product") {
    val p = planStr(qdf("h61_incremental_dedup"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), p)           // exact layer + final admit
    // round 22: the corpus-index signatures are per-row native (the
    // min-over-strings SortAggregate is gone); the remaining aggregates
    // (sizes, intersections) stay partial map-side
    assert(!p.contains("SortAggregate"), p)
    assert(p.contains("partial_count"), p)
  }

  test("h62 novelty: df join is equi on shingle, aggregates partial, explode scan-side") {
    val p = planStr(qdf("h62_ngram_novelty"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    assert(p.contains("Generate"), p)
  }

  test("h58 BPE pairs: top-k is TakeOrderedAndProject over a partial-aggregated count") {
    val p = planStr(qdf("h58_bpe_pair_stats"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    assert(p.contains("Generate"), p)
  }

  test("h59 percentile gate: one window pass partitioned on domain, no global sort before it") {
    val p = planStr(qdf("h59_percentile_gate"))
    assert(p.contains("hashpartitioning(domain"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the second half of the partition-pruning story at 100 TB: when the
    // partition predicate only exists on the DIM side of a join, DPP must
    // push a runtime IN-filter into the fact scan's PartitionFilters —
    // otherwise every date partition of the fact is read to join 1 day
    val scratch = "target/scratch/planspec_dpp"
    val dimPath = "target/scratch/planspec_dpp_dim"
    Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(scratch)
    import org.apache.spark.sql.functions.{col, count, lit}
    // the dim-side predicate must be one DPP's isLikelySelective heuristic
    // recognizes (equality/IN/comparison on a column — a bare boolean
    // attribute is NOT considered selective and suppresses the rewrite)
    spark.createDataFrame(Seq(("click", 1), ("view", 2), ("purchase", 3)))
      .toDF("event_type", "grp")
      .write.mode("overwrite").parquet(dimPath)
    val joined = spark.read.parquet(scratch)
      .join(spark.read.parquet(dimPath).filter(col("grp") === 1), "event_type")
      .agg(count(lit(1)).as("n"))
    val p = planStr(joined)
    assert(p.contains("dynamicpruning"), p)
  }

  test("runtime bloom filter: shuffle join injects a probe-side bloom semi-filter") {
    // when neither side broadcasts, Spark 4's InjectRuntimeFilter can still
    // cut the probe-side shuffle with a bloom filter built from the filtered
    // build side — the conf-gated behavior verified here with test-sized
    // thresholds (production keeps the defaults; the assert is that our
    // query shapes don't break the rewrite)
    val c = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      import org.apache.spark.sql.functions.col
      val li = Tables.lineitem(spark, sf)
      val pt = Tables.part(spark, sf).filter(col("p_size") <= 10)
      val p = planStr(li.join(pt, li("l_partkey") === pt("p_partkey"))
        .select("l_orderkey", "p_name"))
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"), p)
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }

  test("e15 (TPC-H Q3 shape): top-10 plans as TakeOrderedAndProject over broadcast star") {
    val p = planStr(qdf("e15_topn_join_agg"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // both date filters push into their scans
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate") ||
      p.contains("LessThan(o_orderdate"), p)
    assert(p.contains("GreaterThan(l_shipdate"), p)
  }

  test("h89/h90 global ranking is two-phase: range shuffle, no corpus-global window") {
    // the two-phase Ranking construction: the entity-sized data flows
    // through an Exchange rangepartitioning, and EVERY window spec is
    // anchored on the partition id (either partitioned BY it — the local
    // rank — or the #partitions-sized offsets prefix ordered ON it). A
    // window spec without _rk_pid would mean a corpus-global
    // single-partition window crept back in.
    for (name <- Seq("h89_rfm_segments", "h90_pareto_abc")) {
      val p = planStr(qdf(name))
      assert(p.contains("rangepartitioning"), s"$name: $p")
      val specs = "windowspecdefinition\\(".r.findAllMatchIn(p).map { m =>
        p.substring(m.start, math.min(p.length, m.start + 120))
      }.toList
      assert(specs.nonEmpty, s"$name: $p")
      specs.foreach(spec =>
        assert(spec.contains("_rk_pid"), s"$name window not pid-anchored: $spec"))
    }
  }

  test("h89: the three RFM rankings are FUSED — exactly one range exchange") {
    // round 7 replaced three sequential two-phase ranking passes with one
    // union-tagged pass (metric, sort_value, entity). The executed physical
    // plan must carry exactly ONE materialized range Exchange (the offsets
    // subtree reuses it — ReusedExchange/AQE stage reuse, not a second
    // sampling): two or more means someone un-fused the metrics back into
    // chained passes and reintroduced ~8 stages of sampling-job latency.
    val df = qdf("h89_rfm_segments")
    df.collect()
    val fin = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    // REPARTITION_BY_COL = the ranking's explicit repartitionByRange (the
    // output-order sort exchange is ENSURE_REQUIREMENTS — not counted).
    // All mentions (original + ReusedExchange) must share ONE plan_id.
    val p = fin.toString
    val ids = "Exchange rangepartitioning\\([^)]*\\), REPARTITION_BY_COL, \\[plan_id=(\\d+)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(ids.nonEmpty, s"no ranking range exchange found:\n$p")
    assert(ids.distinct.size == 1,
      s"expected ONE fused ranking exchange, got plan_ids $ids:\n$p")
  }
}
