package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

/** Admission-drift alerting for the live intake: when a committed
  * micro-batch rejects more than `maxRejectFraction` of its documents,
  * page once — the first operational symptom of an upstream quality
  * regression (a feed flipping to a new scraper, a producer starting
  * to send malformed rows) is the reject rate jumping, and waiting for
  * a human to poll `/admissions?batch=` is not monitoring.
  *
  * Episode semantics follow the reference's delay alerting
  * (python/main.py:287-292 via [[ValidatingAlerts]]): ONE alert when
  * the intake ENTERS the bad state, silence while it persists, re-arm
  * when a batch clears the bar again — a sustained regression must not
  * page once per minute-batch. Transports are probed at construction
  * ([[ValidatingAlerts]]' fail-fast contract: a misconfigured pager
  * should stop the intake from starting, an alerting outage at runtime
  * must not take the intake down, so `observe` swallows send failures).
  *
  * Cost per batch: one combinable count over the batch's OWN audit
  * partition (batch-sized, partition-pruned by the `batch=` predicate)
  * — run AFTER the commit, so a crash between commit and alert can at
  * worst duplicate a page, never lose data.
  */
final class AdmissionMonitor(transports: Seq[AlertTransport],
    maxRejectFraction: Double = 0.5) {
  require(transports.nonEmpty, "AdmissionMonitor needs at least one transport")
  require(maxRejectFraction >= 0 && maxRejectFraction < 1,
    s"maxRejectFraction must be in [0, 1), got $maxRejectFraction")
  AlertTransport.probeAll(transports, "monitor")

  // driver-side episode latch (foreachBatch and observe run on the
  // driver; volatile for the listener-thread read case)
  @volatile private var inEpisode = false

  /** True while the monitor is inside an un-recovered bad episode. */
  def episodeOpen: Boolean = inEpisode

  /** Adjudicate one committed batch. No-op for an id with no audit
    * rows (an empty batch commits nothing — P4's skip).
    */
  def observe(s: SparkSession, cfg: LivePipeline.Config, batchId: Long): Unit = try {
    // the batch's OWN partition, read directly (O(1) listing): going
    // through auditOutput would list every committed audit partition —
    // O(intake age) driver RPCs per micro-batch, the exact listing
    // pressure compaction exists to prevent
    val counts = LivePipeline.auditBatch(s, cfg, batchId) match {
      case None => return // empty batch committed nothing (P4's skip)
      case Some(rows) => rows.groupBy("fate").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val total = counts.values.sum
    if (total == 0) return
    // in the gateNearDups=false configuration a near_dup fate is still
    // PACKED (LivePipeline.curatePack admits it with the verdict kept
    // as annotation) — counting it as a reject would page on corpora
    // that are merely self-similar, not degraded
    val admitted = counts.getOrElse("admitted", 0L) +
      (if (cfg.gateNearDups) 0L else counts.getOrElse("near_dup", 0L))
    val frac = (total - admitted).toDouble / total
    if (frac > maxRejectFraction) {
      if (!inEpisode) {
        inEpisode = true
        val breakdown = counts.toSeq.sortBy(_._1)
          .map { case (f, n) => s"$f=$n" }.mkString(", ")
        AlertTransport.fanOut(transports,
          f"Intake admission drift: batch $batchId rejected " +
            f"${frac * 100}%.1f%% of $total docs (bar ${maxRejectFraction * 100}%.1f%%): $breakdown")
      }
    } else inEpisode = false
  } catch {
    // the monitor must never take the intake down (its own contract:
    // "an alerting outage at runtime must not take the intake down" —
    // which covers the monitor's OWN read, not only the transports): a
    // transient read failure skips this batch's adjudication; the
    // episode latch is untouched and the next commit re-adjudicates.
    // An interrupt is NOT a read failure — it is stream shutdown
    // cancelling the collect: restore the flag (catching it cleared
    // it) and let the batch wind down, don't swallow the stop signal
    case _: InterruptedException =>
      Thread.currentThread().interrupt()
    case NonFatal(e) =>
      System.err.println(
        s"[admission-monitor] batch $batchId adjudication failed: ${e.getMessage}")
  }
}
