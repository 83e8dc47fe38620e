package graft.extensions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis over the reference's retail domain
  * (transactions of products per customer order,
  * `/root/reference/generate_transaction.py:51`): which item pairs appear
  * in the same basket more often than independence predicts. The text-side
  * analog is h48's PMI collocations; this is the transactional form, with
  * lift as the association measure.
  *
  * 100 TB posture: baskets dedupe to distinct (basket, item) in one
  * partial-aggregated pass, the pair enumeration is a self-EQUI-join on
  * the basket id — cost Σ|basket|² with |basket| bounded by order size
  * (single digits in retail), never |items|² — and pair counts partial-
  * aggregate before their shuffle. Item marginals join back on the item
  * key (broadcast-able: catalog-sized, not corpus-sized); the top-k is
  * TakeOrderedAndProject, so no global sort ever materializes the full
  * pair table.
  *
  * The Σ|basket|² term is the operator's one adversarial knob (the h71
  * heavy-key lever): a real corpus occasionally holds PATHOLOGICAL baskets
  * — a crawler session, a batch-import order, a bot cart — whose size is
  * corpus-shaped, not order-shaped, and a single such basket serializes
  * its |basket|² pairs through one join task. [[pairLift]] therefore wires
  * a basket-size profile in front of the enumeration: heavy baskets — by
  * default SELF-SELECTED as the ones whose pair work exceeds a task's fair
  * share of Σ|basket|² (see [[heavySet]]; a static `heavyBasket` threshold
  * remains available) — are BLOCK-DECOMPOSED — items hash into `nblk ≈
  * size / blockTarget` blocks and the basket's pairs enumerate per block
  * CELL (p ≤ q), so the giant basket's quadratic work spreads over ~nblk²/2
  * parallel tasks instead of one. The decomposition is exact (every
  * unordered pair lands in exactly one cell — see the xs/ys construction),
  * so the result is bit-identical to the plain join and the DuckDB oracle
  * (h80) gates both paths. Replication cost: each heavy item is emitted
  * once per cell it can reach (~nblk rows), O(Σ_heavy |basket|·nblk) ≪ the
  * |basket|² being parallelized. ScaleBench's `hubbasket<N>k` mode measures
  * the payoff; with no heavy basket present the split costs one
  * basket-keyed count — which [[pairLift]] reuses as the n_baskets
  * denominator, REPLACING the old second full-corpus countDistinct pass,
  * so the guarded plan is also the cheaper steady-state plan.
  */
object Baskets {

  /** Top-`k` co-occurring item pairs by pair count (lift as the measure,
    * 4-dp): `lift = n_baskets · c(a,b) / (c(a) · c(b))` over distinct
    * (basket, item) incidences, pairs oriented `item_a < item_b`.
    *
    * `heavyBasket`: positive = STATIC threshold — baskets with at least
    * this many distinct items take the block-decomposed enumeration (see
    * the object scaladoc). `<= 0` (the default) = SELF-TUNED (round 19,
    * the h71 profile wired in): a basket is decomposed exactly when its
    * quadratic pair work exceeds one task's fair share of the corpus-total
    * pair work — `bsz² · shuffle_partitions > Σ bsz²` — with a
    * `2·blockTarget` floor below which the replication can't pay (nblk
    * would be ≤ 2). The rule is the decomposition's own payoff condition:
    * a basket under it fits inside one task's average load, so splitting
    * it buys nothing; a basket over it IS the straggler. Derived from the
    * same `sizes` count the denominator already needs, so the profile
    * costs nothing extra; either path is bit-identical (Round6Spec), the
    * choice only moves work. `blockTarget`/`maxBlocks` size the
    * decomposition: nblk = clamp(ceil(size/blockTarget), 1, maxBlocks).
    *
    * Auto is the INTENDED default contract (round 19→20): every existing
    * caller (e.g. h71's profile consumer, h80's lift) inherits the
    * profile-guarded plan deliberately — the Σbsz² profile rides an
    * aggregate the denominator already pays, results are bit-identical on
    * either path (Round6Spec), and the only behavior change is plan shape
    * under pathological skew. Callers that must keep the pre-auto static
    * plan pass an explicit positive `heavyBasket`.
    */
  def pairLift(df: DataFrame, basketCol: String, itemCol: String,
      k: Int, heavyBasket: Int = 0, blockTarget: Int = 1024,
      maxBlocks: Int = 64): DataFrame = {
    require(heavyBasket != 1 && blockTarget > 0 && maxBlocks > 0,
      "heavyBasket must be <= 0 (auto) or > 1; blockTarget and maxBlocks positive")
    // FOUR consumers read the distinct incidence relation (sizes, item
    // marginals, and the split pair enumeration), and the heavy-set
    // broadcast makes the size profile a blocking dependency of the join —
    // checkpoint it once instead of recomputing the scan+distinct per
    // consumer (the token_rows posture, operator-internal)
    val b = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .localCheckpoint(eager = false)
    // ONE basket-keyed count serves both the heavy-basket profile and the
    // n_baskets denominator (count of its rows == the old countDistinct),
    // and ONE roll-up over it carries both totals the plan needs — the
    // basket count for the lift denominator AND the Σbsz² fair-share total
    // the auto-trigger compares against (an extra aggregate stage here
    // measured ~0.5 s of pure stage latency at sf0.1)
    val sizes = b.groupBy("basket").agg(count(lit(1)).as("bsz"))
    val prof = sizes.agg(count(lit(1)).as("n"),
      sum(col("bsz").cast("double") * col("bsz")).as("__sq"))
    val nB = prof.select("n")
    val itemCnt = b.groupBy("item").agg(count(lit(1)).as("c"))
    val cellPar = df.sparkSession.sessionState.conf.numShufflePartitions
    // the heavy set is pathology-sized (usually empty), so it broadcasts;
    // a LEFT join tags incidences without shuffling b by a new key
    val heavy = heavySet(sizes, heavyBasket, blockTarget, cellPar,
      Some(prof.select("__sq")))
    val tagged = b.join(broadcast(heavy), Seq("basket"), "left")
    val light = tagged.filter(col("bsz").isNull).select("basket", "item")
    val lightPairs = light.as("x")
      .join(light.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .select(col("x.item").as("item_a"), col("y.item").as("item_b"))
    // Block decomposition for heavy baskets: item → block blk =
    // hash(item) mod nblk; the basket's pair space partitions into cells
    // (p, q), p ≤ q. The x side emits each item into cells (blk, q≥blk),
    // the y side into cells (p≤blk, blk), so an unordered pair with blocks
    // {ca ≤ cb} meets in EXACTLY cell (ca, cb) — off-diagonal cells once
    // (only the orientation x∈ca, y∈cb matches), diagonal cells twice
    // (both orientations), which the p = q ⇒ item_x < item_y filter halves.
    val hv = tagged.filter(col("bsz").isNotNull)
      .withColumn("nblk",
        least(ceil(col("bsz").cast("double") / lit(blockTarget)),
          lit(maxBlocks.toLong)).cast("int"))
      .withColumn("blk", pmod(xxhash64(col("item")), col("nblk")).cast("int"))
    // the cell join's INPUTS are replication-sized (tiny) but its OUTPUT is
    // the |basket|² pair stream — AQE's coalescing reads the input sizes
    // and would collapse the join to one partition, re-serializing exactly
    // the work the decomposition exists to spread (measured 2.2× WORSE than
    // plain); an explicit fixed-count repartition on the cell key is exempt
    // from AQE coalescing, so cells stay spread across the cluster and each
    // task enumerates + partial-aggregates only its cells' pairs
    val xs = hv
      .withColumn("q", explode(sequence(col("blk"), col("nblk") - 1)))
      .select(col("basket"), col("item").as("item_x"),
        col("blk").as("p"), col("q"))
      .repartition(cellPar, col("basket"), col("p"), col("q"))
    val ys = hv
      .withColumn("p", explode(sequence(lit(0), col("blk"))))
      .select(col("basket"), col("item").as("item_y"),
        col("p"), col("blk").as("q"))
    val heavyPairs = xs.join(ys, Seq("basket", "p", "q"))
      .filter(col("p") < col("q") || col("item_x") < col("item_y"))
      .select(least(col("item_x"), col("item_y")).as("item_a"),
        greatest(col("item_x"), col("item_y")).as("item_b"))
    val pairs = lightPairs.unionByName(heavyPairs)
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("pair_cnt"))
    pairs
      .join(itemCnt.select(col("item").as("item_a"), col("c").as("c_a")), "item_a")
      .join(itemCnt.select(col("item").as("item_b"), col("c").as("c_b")), "item_b")
      .crossJoin(broadcast(nB))
      .withColumn("lift", Det.floorRound(
        col("n").cast("double") * col("pair_cnt").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double")), 4))
      .select("item_a", "item_b", "pair_cnt", "c_a", "c_b", "lift")
      .orderBy(col("pair_cnt").desc, col("item_a"), col("item_b"))
      .limit(k)
  }

  /** The decomposition trigger of [[pairLift]]: which baskets take the
    * block-decomposed enumeration. Positive `heavyBasket` = the static
    * rule (`bsz >= heavyBasket`); otherwise the SELF-TUNED rule — a basket
    * is heavy iff its pair work `bsz²` exceeds one task's fair share of
    * the corpus total (`bsz² · cellPar > Σ bsz²`, compared in doubles: the
    * trigger is a heuristic, overflow-free beats exact here) and clears
    * the `2·blockTarget` replication floor. Package-visible so Round6Spec
    * pins the selection itself (the result is bit-identical either way, so
    * only the trigger can be asserted directly).
    */
  private[graft] def heavySet(sizes: DataFrame, heavyBasket: Int,
      blockTarget: Int, cellPar: Int,
      sqTotal: Option[DataFrame] = None): DataFrame =
    if (heavyBasket > 0) sizes.filter(col("bsz") >= lit(heavyBasket.toLong))
    else {
      // `sqTotal` lets pairLift pass the Σbsz² it already rolled up with
      // the n_baskets denominator (one aggregate serving both) — the
      // self-contained fallback recomputes it for direct callers/tests
      val tot = sqTotal.getOrElse(sizes
        .agg(sum(col("bsz").cast("double") * col("bsz")).as("__sq")))
      sizes.crossJoin(broadcast(tot))
        .filter(col("bsz") >= lit(2L * blockTarget) &&
          col("bsz").cast("double") * col("bsz") * cellPar > col("__sq"))
        .select("basket", "bsz")
    }
}
