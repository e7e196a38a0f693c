package graft.streaming

/** Failure-alerting contract of the reference's ingest loop
  * (python/main.py:286-309, transport plumbing :312-366): when the next
  * checkpoint goes missing, notify ONCE per delay episode (the archive
  * may just be lagging), and notify once more — then stop — when the
  * bounded retries are exhausted.
  *
  * The reference hard-codes its transports (SES email + a Lambda); an
  * engine library exposes the hook instead and lets the deployment bind
  * it to whatever pager it uses. Callback failures are the caller's
  * problem by design — an alerting bug must not take down ingest, so
  * [[ArchiveTail]] swallows and logs exceptions thrown from these.
  */
trait IngestAlerts {
  /** First consecutive miss of `seq`: the archive is delayed. Fired once
    * per episode (python/main.py:287-292 "only sending notification on
    * 1st occurrence").
    */
  def onDelay(seq: Long): Unit = ()

  /** Retries exhausted waiting for `seq` after `attempts` misses; the
    * tail gives up after this (python/main.py:301-305 "Reached retry
    * limit. Quitting.").
    */
  def onGiveUp(seq: Long, attempts: Int): Unit = ()
}

object IngestAlerts {
  /** Default: no alerting bound. */
  object Noop extends IngestAlerts
}

/** Per-commit ingest observability, the hook form of the reference's
  * post-save logging ("Successfully stored the data of file: X",
  * python/adapters/hc_storage_adapter.py:47-58 — which also knows how
  * many payments/creations it just stored). Bound to Noop by default:
  * the counts cost one extra aggregation pass over the checkpoint's
  * (small, ≤64-ledger) extract, so the engine only pays it when a
  * deployment actually wires the hook to its metrics system.
  */
trait IngestMetrics {
  /** A checkpoint committed: `seq` plus its payment/creation row counts. */
  def onCommit(seq: Long, nPayments: Long, nCreations: Long): Unit = ()
}

object IngestMetrics {
  /** Default: no metrics bound (and no counting pass run). */
  object Noop extends IngestMetrics
}
