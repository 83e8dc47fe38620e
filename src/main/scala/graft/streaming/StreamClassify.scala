package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.extensions.Classifier

/** Streaming corpus admission through a FROZEN trained classifier — the
  * piece that closes the trained-model loop into the streaming surface:
  * [[graft.extensions.Classifier.qualityLrScores]] (h116) trains the gate
  * once over the accumulated corpus; every arriving micro-batch is then
  * scored with those frozen weights inside `foreachBatch` and lands under
  * its own `epoch=<id>` partition through [[IdempotentSink]] — the same
  * exactly-once posture as [[StreamAnnIngest.ingestEpoch]], so at-least-once
  * re-delivery REPLACES an epoch's scores instead of double-admitting, and
  * the downstream corpus fold reads `pred = 1` rows like any partitioned
  * table.
  *
  * Freshness is the standard serving contract: weights refresh on the
  * maintenance cadence (retrain over the grown corpus, then either restart
  * the query — its checkpoint replays nothing already epoch-committed — or
  * publish the new vector through a `java.util.concurrent.atomic
  * .AtomicReference[Array[Long]]` the `foreachBatch` body reads ONCE per
  * batch before calling [[scoreEpoch]]). Never mutate a shared
  * `Array[Long]` in place under a running query: array writes are not
  * synchronized with an in-flight batch's reads, so a batch could score
  * against a TORN weight vector — nondeterministic scores that break the
  * replay-equals-original property the idempotent epoch sink depends on.
  * Scoring inside the batch is scan-side featurize + a broadcast weight
  * fold — no state store, no shuffle beyond the batch's own featurize
  * aggregate.
  */
object StreamClassify {

  /** `foreachBatch` body: frozen-weight scoring → idempotent epoch write.
    * The output carries `idCol, score_q, pred` — membership and the admit
    * bit; content stays in the raw zone keyed by id (the lakehouse-zone
    * contract, Lakehouse.scala).
    */
  def scoreEpoch(batch: DataFrame, epochId: Long, idCol: String,
      textCol: String, weights: Array[Long], nBuckets: Int,
      outPath: String): Unit =
    IdempotentSink.writeEpoch(
      Classifier.scoreWith(batch, idCol, textCol, weights, nBuckets),
      epochId, outPath)
}
