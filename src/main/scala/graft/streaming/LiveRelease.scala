package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{DpLedger, Privacy}

/** The STREAMING twin of the x47 continual release — the tree
  * mechanism run the way Chan–Shi–Song actually frame it: counts
  * arrive continuously, the released running count must stay current,
  * and the whole window still spends one ε.
  *
  * The batch spelling ([[Privacy.dpContinualRelease]]) recomputes the
  * daily counts from raw events at every release. Under continuous
  * ingest that is a full corpus rescan per release; this twin
  * maintains the dailies INCREMENTALLY in a [[LiveCounts]] store (one
  * batch-sized combinable partial per micro-batch, exactly-once by
  * partition overwrite) and releases from the re-aggregated totals via
  * [[Privacy.dpContinualReleaseFromDaily]]. Day counts are additive
  * over events, so the live totals are bit-identical to the batch
  * groupBy — and because every downstream step (public grid, per-node
  * seeded Laplace, dyadic decomposition) is deterministic given the
  * dailies, a release from the live store EQUALS the batch release on
  * the same records, clamped integer for clamped integer
  * (StreamingSpec pins the equivalence, plus replay idempotence and
  * the as-of prefix view).
  *
  * Privacy accounting is unchanged: ε is charged per WINDOW through
  * the [[DpLedger]] charge-then-release wrapper at RELEASE time, not
  * at ingest time — the store holds true (un-noised) counts and is
  * private infrastructure, never shipped; only [[release]]'s clamped
  * integers leave. Re-releasing the same window with fresh salted
  * noise is a new ε charge the ledger meters (the composed-release
  * attack spec's cap applies verbatim). Deterministic re-DERIVATION of
  * an already-charged release (same salt ⇒ bit-identical draws ⇒ the
  * same release, no new information) is how [[SvtMonitor]] re-checks
  * its armed episode without re-charging; the HTTP tier deliberately
  * does NOT offer that path — every /release and /alert request
  * charges, even under the server's seeded test config where bodies
  * repeat bit-identically (r17 advice). Over-charging is the safe
  * direction; an uncharged re-read would need the server to prove the
  * request byte-equivalent to a prior charged one — caching's job,
  * not the ledger's.
  *
  * 100 TB shape: per micro-batch cost is one combinable day-count
  * partial (batch-sized); release-time cost is one re-aggregation over
  * day-keyed partials (key space = calendar days — thousands, never
  * corpus-sized) plus the public-window-sized tree frame. Reference:
  * the reference's polling loop commits per-file row batches
  * (python/main.py:64-105); this is the same commit discipline carrying
  * a DP release surface instead of a SQL sink.
  */
object LiveRelease {

  final case class Config(root: String)

  private def ccfg(cfg: Config) = LiveCounts.Config(cfg.root)

  /** One `(key = ISO day)` observation row per event — LiveCounts'
    * observation transform. String keys so the store stays in the
    * shared counts schema; [[release]] parses them back to dates.
    */
  private def prep(events: DataFrame): DataFrame =
    events.select(to_date(col("ts")).cast("string").as("key"))

  /** Continuous intake over a streaming events frame. */
  def start(events: DataFrame, cfg: Config): StreamingQuery =
    LiveCounts.start(events, ccfg(cfg), prep)

  /** One incremental step (the foreachBatch body, callable directly in
    * tests and backfills) — exactly-once per batchId by partition
    * overwrite, [[LiveCounts.step]]'s contract.
    */
  def step(events: DataFrame, batchId: Long, cfg: Config): Unit =
    LiveCounts.step(prep(events), batchId, ccfg(cfg))

  /** Fold committed partials ([[LiveCounts.compact]]). */
  def compact(s: SparkSession, cfg: Config): Unit =
    LiveCounts.compact(s, ccfg(cfg))

  /** The tree-mechanism release from the live store's totals as of a
    * commit point (default: the live frontier). Same output schema,
    * seeding, and ledger contract as [[Privacy.dpContinualRelease]];
    * equal to it on the same ingested records.
    */
  def release(s: SparkSession, cfg: Config, window: Int = 0,
      seeded: Boolean = false, ledger: Option[DpLedger] = None,
      releaseId: String = "continual", asOf: Long = Long.MaxValue): DataFrame = {
    val daily = dailyCounts(s, cfg, asOf)
    Privacy.dpContinualReleaseFromDaily(daily, seeded, window, ledger, releaseId)
  }

  /** The SVT alert from the live store (x51's streaming twin): "has
    * the daily volume crossed `threshold` yet, and when" — asked of
    * every public calendar day for ONE ε, from the totals as of a
    * commit point. SVT is intrinsically an alerting mechanism; this is
    * where an alerting pipeline actually asks it. Equal to the batch
    * [[Privacy.dpAboveThresholdRelease]] on the same ingested records
    * (StreamingSpec pins it alongside the continual twin).
    */
  def aboveThreshold(s: SparkSession, cfg: Config, threshold: Double = 100.0,
      seeded: Boolean = false, ledger: Option[DpLedger] = None,
      releaseId: String = "svt", asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpAboveThresholdFromDaily(dailyCounts(s, cfg, asOf),
      threshold, seeded, ledger, releaseId)

  /** [[graft.operators.Privacy.aboveThresholdSalted]] over the live
    * store — the episode engine [[SvtMonitor]] re-reads at every
    * check (fixed per-episode salt ⇒ same draws ⇒ a re-read, not a
    * new release; the monitor does its own per-episode charging).
    */
  private[graft] def aboveThresholdEpisode(s: SparkSession, cfg: Config,
      threshold: Double, salt: String,
      resumeAfter: Option[java.sql.Timestamp],
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.aboveThresholdSalted(dailyCounts(s, cfg, asOf),
      threshold, salt, resumeAfter)

  /** The numeric-sparse twin (x53): up to `c` alerts for one ε from
    * the live store's totals — the fixed-alert-budget alternative to
    * [[graft.streaming.SvtMonitor]]'s pay-per-episode re-arm
    * ([[Privacy.dpSparseFromDaily]] carries the trade-off).
    */
  def sparse(s: SparkSession, cfg: Config, threshold: Double = 100.0,
      c: Int = 2, seeded: Boolean = false, ledger: Option[DpLedger] = None,
      releaseId: String = "sparse", asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpSparseFromDaily(dailyCounts(s, cfg, asOf),
      threshold, c, seeded, ledger, releaseId)

  private def dailyCounts(s: SparkSession, cfg: Config, asOf: Long): DataFrame =
    LiveCounts.totals(s, ccfg(cfg), asOf)
      .select(to_date(col("key")).as("day"), col("n").as("cnt"))
}
