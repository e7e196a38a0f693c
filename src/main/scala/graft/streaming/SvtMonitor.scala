package graft.streaming

import org.apache.spark.sql.SparkSession
import graft.operators.{DpLedger, Privacy}

import scala.util.control.NonFatal

/** The alerting habitat SVT exists for (r17 verdict #4): x51 gives the
  * MECHANISM — "has the daily volume crossed T yet" answered for one ε
  * — and [[LiveRelease.aboveThreshold]] asks it of the live store, but
  * until now nothing PAGED: an alerting pipeline needs the verdict
  * pushed through transports with episode semantics, not polled as a
  * frame. This monitor composes the three existing disciplines:
  *
  *  - [[AdmissionMonitor]]'s episode semantics: ONE page when the
  *    stream enters the alert state (the episode's first ⊤), silence
  *    on every further check of the same episode, and a fail-fast
  *    transport probe at construction with send-failures swallowed at
  *    runtime (an alerting outage must not take the intake down);
  *  - SVT's budget shape: each EPISODE is one AboveThreshold stream —
  *    one ε charged at arm time through the [[DpLedger]]
  *    charge-then-release wrapper, covering every check of that
  *    episode (checks re-derive the same draws from a fixed
  *    per-episode salt, so they are re-reads of the same release, not
  *    new charges — [[Privacy.aboveThresholdSalted]]);
  *  - the x48/x53 resume discipline: after an episode alerts at day d
  *    (a RELEASED public value), the monitor re-arms a NEW ε-charged
  *    episode whose question schedule is the days strictly after d —
  *    post-processing of released values, zero extra budget for the
  *    scoping itself. The re-arm (and its charge) is DEFERRED while
  *    that schedule is empty — an alert on the grid's last askable
  *    day, or a resume boundary sitting at the day-close frontier —
  *    because arm = charge and an episode with nothing to ask would
  *    spend ε on silence (r19 review; the emptiness probe is
  *    structural — grid × boundary × frontier — and draws no noise). A deployment that knows its alert count up
  *    front can pay once instead via the numeric-sparse release
  *    ([[LiveRelease.sparse]], x53) — ε total with c-scaled noise
  *    versus this monitor's ε per episode with unit-scale noise; the
  *    [[Privacy.dpSparseRelease]] scaladoc carries the trade.
  *
  * An EXHAUSTED budget alerts nothing, permanently and quietly (one
  * stderr line): arming the next episode throws [[DpLedger
  * .BudgetRefused]] BEFORE any frame exists, the monitor latches
  * `budgetExhausted`, and every later check is a no-op — the privacy
  * policy answering "not anymore" (the 429 contract, driver-side).
  *
  * Check cadence is ENFORCED, not guidance (r18 verdict #3): an
  * episode's per-day noise is fixed, so checking MID-day would answer
  * that day's question against partial counts and a later check
  * re-answer it with fuller counts under the same draw — two different
  * queries, one noise draw, which weakens the per-query accounting for
  * that day. `completedDaysOnly` (DEFAULT ON) therefore excludes the
  * newest day present in the store from the question schedule: a day's
  * question is first asked only once a later day's data exists, i.e.
  * its count has stopped moving, so every asked question is asked of
  * final counts exactly once per episode — the reference's daily-report
  * cadence (python/main.py:254-308's polling loop runs a file behind
  * the archive frontier for the same reason) made structural. The
  * opt-OUT (`completedDaysOnly = false`) restores the eager spelling
  * for deployments that ingest strictly day-at-once batches (where the
  * newest day is already final) and accept the documented slack
  * otherwise.
  *
  * Cost per check: one day-keyed re-aggregation of the live store
  * (calendar-days-sized, never corpus-sized) plus the public 64-row
  * grid — the [[LiveRelease]] release-time shape, driver-collected at
  * window size (bounded by construction).
  *
  * DURABLE episode state (r18 self-review): the episode counter, the
  * armed salt, and the resume boundary persist to one fsync'd line
  * under `cfg.root/svt-monitor/` and reload at construction — without
  * this, a driver restart forgets it already paged (re-alerting the
  * same old spike) and re-charges a fresh ε for questions an armed
  * episode already paid for. Write ordering is charge → persist →
  * act, so every crash window fails SAFE: a crash between the ledger
  * charge and the state write wastes that ε (the charge-then-release
  * direction — budget can be wasted, never exceeded), and a crash
  * between the page and the alerted-state write can duplicate a page
  * (the AdmissionMonitor contract: at worst a duplicate page, never a
  * lost one). The persisted salt lives beside the live count store in
  * the same trust domain as the un-noised counts themselves — it must
  * never ship to release consumers, exactly like the store. One
  * monitor instance per (root, prefix) is the premise (the ledger's
  * lock remains the budget backstop if it is violated).
  */
final class SvtMonitor(transports: Seq[AlertTransport],
    cfg: LiveRelease.Config, threshold: Double = 100.0,
    ledger: Option[DpLedger] = None,
    releaseIdPrefix: String = "svt-monitor", seeded: Boolean = false,
    completedDaysOnly: Boolean = true) {
  require(transports.nonEmpty, "SvtMonitor needs at least one transport")
  require(!releaseIdPrefix.contains("\t") && !releaseIdPrefix.contains("\n") &&
    !releaseIdPrefix.contains("/"),
    "releaseIdPrefix must be tab/newline/slash-free (state file name + ledger id)")
  AlertTransport.probeAll(transports, "svt-monitor")

  // driver-side episode state (checks run on the driver, like
  // AdmissionMonitor.observe), durably mirrored to the state file
  private var episodeN = 0
  private var armedSalt: Option[String] = None
  private var resumeAfter: Option[java.sql.Timestamp] = None
  @volatile private var exhausted = false

  private val stateFile = {
    val dir = new java.io.File(cfg.root, "svt-monitor")
    if (!dir.exists()) require(dir.mkdirs() || dir.exists(),
      s"cannot create monitor state dir $dir")
    new java.io.File(dir, s"$releaseIdPrefix.state.tsv")
  }
  // resume: (episode, armed salt or "-", resume-after millis or "-")
  if (stateFile.exists()) {
    val src = scala.io.Source.fromFile(stateFile, "UTF-8")
    val line = try src.getLines().find(_.nonEmpty) finally src.close()
    line.map(_.split("\t", -1)) match {
      case Some(Array(e, salt, resume)) =>
        episodeN = e.toInt
        armedSalt = if (salt == "-") None else Some(salt)
        resumeAfter =
          if (resume == "-") None else Some(new java.sql.Timestamp(resume.toLong))
      case Some(other) =>
        sys.error(s"corrupt monitor state in $stateFile: '${other.mkString("\t")}'")
      case None => () // empty file: fresh monitor
    }
  }

  private def persist(): Unit = {
    val line = s"$episodeN\t${armedSalt.getOrElse("-")}\t" +
      s"${resumeAfter.fold("-")(_.getTime.toString)}\n"
    val out = new java.io.FileOutputStream(stateFile, false)
    try { out.write(line.getBytes("UTF-8")); out.getFD.sync() }
    finally out.close()
  }

  /** Episodes armed so far (== alerts fired + the currently armed one,
    * once any question has been asked).
    */
  def episode: Int = synchronized(episodeN)

  /** True once a budget refusal has permanently silenced the monitor. */
  def budgetExhausted: Boolean = exhausted

  /** Ask the current episode's question of the live store as of a
    * commit point and page on its first ⊤. Returns the alert day when
    * THIS check fired the page (for tests and callers that chain), and
    * None on silence — including the exhausted-budget silence.
    */
  def check(s: SparkSession, asOf: Long = Long.MaxValue): Option[java.sql.Timestamp] =
    synchronized {
      if (exhausted) return None
      if (armedSalt.isEmpty) {
        // arm = charge, so the question schedule must be NON-EMPTY
        // first: an episode with nothing to ask would spend real ε on
        // silence. Empty schedules are structural, not transient —
        // an alert on the grid's last day (the x47/x48 rollover
        // boundary: the next window is a fresh monitor), or a resume
        // boundary sitting at the day-close frontier (the schedule
        // fills as later days close; arming then is free to defer).
        // The probe is public-grid × boundary × store-frontier shape —
        // no noise drawn, nothing released — and because it evaluates
        // through the grid's own Spark spelling, the session-vs-JVM
        // timezone skew the old static Timestamp guard carried (r18
        // advice) cannot recur. A transient probe failure skips this
        // check like any read failure (the AdmissionMonitor contract).
        val armable =
          try LiveRelease.canArmEpisode(s, cfg, resumeAfter, asOf, completedDaysOnly)
          catch {
            case _: InterruptedException =>
              Thread.currentThread().interrupt(); return None
            case NonFatal(e) =>
              System.err.println(s"[svt-monitor] check failed: ${e.getMessage}")
              return None
          }
        if (!armable) return None
        // arm = charge: one ε covers every check of this episode.
        // BudgetRefused latches exhaustion; no frame ever existed. A
        // caller-bug exception (currency mismatch, closed ledger)
        // PROPAGATES — it must fail loudly, not read as a transient
        // check failure retried forever (r18 review; the contract the
        // currency enforcement exists for).
        try ledger.foreach(_.charge(s"$releaseIdPrefix|e$episodeN",
          "above_threshold_svt", BigDecimal(1)))
        catch {
          case e: DpLedger.BudgetRefused =>
            exhausted = true
            System.err.println(s"[svt-monitor] budget exhausted at " +
              s"episode $episodeN — alerting permanently dark: ${e.getMessage}")
            return None
        }
        // the episode index joins the seed domain: each re-armed
        // episode must draw INDEPENDENT noise even under seeded = true
        // (r18 review — releaseSalt(true) is "" for every arm, and the
        // day tags carry no episode counter; without the prefix,
        // consecutive episodes would re-bill the ledger for
        // bit-identical draws, the x53 per-episode-domain discipline
        // violated silently)
        armedSalt = Some(s"e$episodeN|" + Privacy.releaseSalt(seeded))
        episodeN += 1
        // durable BEFORE any question is asked: a crash after the
        // charge but before this write wastes the ε (safe direction);
        // after it, a restarted monitor resumes the SAME episode —
        // same salt, same draws, no re-charge
        persist()
      }
      try {
        val verdicts = LiveRelease.aboveThresholdEpisode(s, cfg, threshold,
          armedSalt.get, resumeAfter, asOf, completedDaysOnly).collect()
        val alertDay = verdicts.lastOption
          .filter(_.getBoolean(1)).map(_.getTimestamp(0))
        alertDay.foreach { day =>
          AlertTransport.fanOut(transports,
            s"DP volume alert: daily event volume crossed threshold " +
              s"$threshold at $day (episode ${episodeN - 1}, " +
              "epsilon=1 for the whole episode)")
          // the episode has halted (SVT semantics): re-arm LAZILY — the
          // next check charges a fresh ε for a new stream resuming
          // strictly after the released alert day. Persisted AFTER the
          // page: a crash between the two can duplicate the page on
          // restart (the AdmissionMonitor contract), never lose it.
          armedSalt = None
          resumeAfter = Some(day)
          persist()
        }
        alertDay
      } catch {
        // the monitor must never take the intake down (the
        // AdmissionMonitor contract): a transient read failure skips
        // this check; episode state is untouched, the next check
        // re-asks. An interrupt is stream shutdown, not a failure.
        case _: InterruptedException =>
          Thread.currentThread().interrupt(); None
        case NonFatal(e) =>
          System.err.println(s"[svt-monitor] check failed: ${e.getMessage}")
          None
      }
    }
}
