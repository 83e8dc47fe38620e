package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, expr}

/** Stream-stream joins over event time. Both sides carry watermarks and the
  * join condition bounds the time skew, so Spark can expire join state: each
  * side buffers only rows inside (watermark − interval) — bounded state, the
  * only formulation that survives unbounded streams. The same functions run
  * on batch DataFrames (watermarks are no-ops there), giving an
  * oracle-checkable batch shape for the identical code.
  */
object StreamJoins {

  /** Attribution: each purchase joined to every click by the same user in
    * the `attributionWindow` before it (inclusive). Inner join → emitted as
    * soon as both sides are present; state for each side expires once the
    * watermark passes its possible-match horizon.
    *
    * Inputs are event frames with at least (user_id, event_id, ts); column
    * name collisions are resolved by the c_/p_ prefixes in the output.
    */
  def clickPurchaseAttribution(clicks: DataFrame, purchases: DataFrame,
      watermarkDelay: String = "1 hour",
      attributionWindow: String = "30 minutes"): DataFrame = {
    val c = clicks
      .selectExpr("user_id", "event_id AS c_event_id", "ts AS c_ts")
      .withWatermark("c_ts", watermarkDelay)
    val p = purchases
      .selectExpr("user_id AS p_user_id", "event_id AS p_event_id", "ts AS p_ts")
      .withWatermark("p_ts", watermarkDelay)
    c.join(p,
      expr(s"""user_id = p_user_id AND
              |p_ts >= c_ts AND
              |p_ts <= c_ts + interval $attributionWindow""".stripMargin))
      .select("user_id", "c_event_id", "c_ts", "p_event_id", "p_ts")
  }

  /** Stream-static enrichment: the event stream inner-joined with a slowly-
    * changing dimension snapshot (events.user_id → customer.c_custkey). The
    * OTHER streaming-join pattern next to [[clickPurchaseAttribution]]'s
    * stream-stream form: STATELESS — no watermark, no join state, because
    * the static side is a bounded relation Spark re-resolves per micro-batch
    * and (with the explicit hint honored in both modes) broadcasts to the
    * stream's executors. At 100 TB of stream this is the only join shape
    * whose cost is independent of stream history; the dim just has to fit
    * the broadcast budget — a bigger dim drops the hint and bucket-joins.
    * The same function runs on a batch events frame (h53 oracles it).
    */
  def enrichWithCustomer(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        events("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value"), col("c_mktsegment"))
}
