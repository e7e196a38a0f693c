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

  // sibling stores under the same root for the δ-licensed releases
  // (x54/x55): the stability histograms need (event_type, day) cell
  // counts and the distinct (user_id, event_type, day) user-cell set,
  // neither derivable from the day-keyed store. Keys lead with the
  // fixed-width ISO day (10 chars) so parsing never depends on the
  // payload being separator-free.
  private def cellCfg(cfg: Config) = LiveCounts.Config(s"${cfg.root}/cells")
  private def userCellCfg(cfg: Config) = LiveCounts.Config(s"${cfg.root}/ucells")

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
      asOf: Long = Long.MaxValue,
      completedDaysOnly: Boolean = false): DataFrame =
    Privacy.aboveThresholdSalted(dailyCounts(s, cfg, asOf),
      threshold, salt, resumeAfter, completedDaysOnly)

  /** [[graft.operators.Privacy.hasAskableQuestion]] over the live
    * store — the monitor's arm-time charge guard (arming charges ε;
    * an episode with a currently empty question schedule would spend
    * it on silence).
    */
  private[graft] def canArmEpisode(s: SparkSession, cfg: Config,
      resumeAfter: Option[java.sql.Timestamp],
      asOf: Long = Long.MaxValue,
      completedDaysOnly: Boolean = false): Boolean =
    Privacy.hasAskableQuestion(dailyCounts(s, cfg, asOf),
      resumeAfter, completedDaysOnly)

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

  /** The x63 range-count release from the live store (the Hay et al.
    * noised dyadic tree answering the public 94-range query set for
    * one ε) — the x47 twin argument verbatim: additive day counts +
    * public-grid math + seeded node noise ⇒ live == batch.
    */
  def rangeRelease(s: SparkSession, cfg: Config, seeded: Boolean = false,
      ledger: Option[DpLedger] = None, releaseId: String = "range_tree",
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpRangeFromDaily(dailyCounts(s, cfg, asOf), seeded, ledger, releaseId)

  private def dailyCounts(s: SparkSession, cfg: Config, asOf: Long): DataFrame =
    LiveCounts.totals(s, ccfg(cfg), asOf)
      .select(to_date(col("key")).as("day"), col("n").as("cnt"))

  // ---- the δ-licensed twins (x54/x55) ----------------------------------

  /** One `(key = ISO-day|event_type)` observation per event — the cell
    * store's transform. Day first and fixed-width, so the type may
    * contain anything.
    */
  private def prepCells(events: DataFrame): DataFrame =
    events.select(concat(to_date(col("ts")).cast("string"), lit("|"),
      col("event_type")).as("key"))

  /** One `(key = ISO-day|<ulen>|<user><event_type>)` observation per
    * event. The user id is LENGTH-PREFIXED rather than delimited
    * (r19 review): a delimiter-split spelling silently mis-parses any
    * deployment whose user ids are non-numeric or contain the
    * delimiter — merging distinct users before the per-user cap, which
    * voids the x55 user-level sensitivity claim without an error. The
    * decimal length can contain no `|`, so `<ulen>` bounds the user
    * field exactly and BOTH remaining fields may contain anything.
    * (Null user ids null the whole key — pre-filter them; the batch
    * spelling's contract is the same.)
    */
  private def prepUserCells(events: DataFrame): DataFrame =
    events.select(concat(to_date(col("ts")).cast("string"), lit("|"),
      length(col("user_id").cast("string")).cast("string"), lit("|"),
      col("user_id").cast("string"), col("event_type")).as("key"))

  /** Continuous cell-count intake for [[stableHistogram]]. */
  def startCells(events: DataFrame, cfg: Config): StreamingQuery =
    LiveCounts.start(events, cellCfg(cfg), prepCells)

  def stepCells(events: DataFrame, batchId: Long, cfg: Config): Unit =
    LiveCounts.step(prepCells(events), batchId, cellCfg(cfg))

  def compactCells(s: SparkSession, cfg: Config): Unit =
    LiveCounts.compact(s, cellCfg(cfg))

  /** Continuous user-cell intake for [[userHistogram]]. The store
    * holds per-(day, user, type) EVENT counts; the release uses only
    * key PRESENCE (n ≥ 1 ⇔ the user touched the cell), which is what
    * makes the distinct user-cell set idempotent-union additive across
    * batches — replay and fold cannot change membership.
    */
  def startUserCells(events: DataFrame, cfg: Config): StreamingQuery =
    LiveCounts.start(events, userCellCfg(cfg), prepUserCells)

  def stepUserCells(events: DataFrame, batchId: Long, cfg: Config): Unit =
    LiveCounts.step(prepUserCells(events), batchId, userCellCfg(cfg))

  def compactUserCells(s: SparkSession, cfg: Config): Unit =
    LiveCounts.compact(s, userCellCfg(cfg))

  /** The x54 stability histogram from the live cell-count store — the
    * δ-licensed release regime's streaming twin (r18 verdict #3: every
    * other regime had one — x47→release, x51→aboveThreshold,
    * x53→sparse — while the regime whose INPUT is exactly a live count
    * store had none). Cell counts are additive over events and the
    * noise/τ/clamp tail is deterministic given the cells
    * ([[graft.operators.Privacy.dpStableHistogramFromCells]]), so live
    * equals batch bit-for-bit on the same ingested records
    * (StreamingSpec pins it). The ledger charge is the (ε, δ) PAIR —
    * the registry's δ metering applies to the live spelling exactly as
    * to batch.
    */
  def stableHistogram(s: SparkSession, cfg: Config, seeded: Boolean = false,
      delta: Double = 1e-6, ledger: Option[DpLedger] = None,
      releaseId: String = "stable_hist",
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpStableHistogramFromCells(
      LiveCounts.totals(s, cellCfg(cfg), asOf)
        .select(to_timestamp(substring(col("key"), 1, 10)).as("day"),
          expr("substring(key, 12)").as("event_type"), col("n").as("true_n")),
      seeded, delta, ledger, releaseId)

  /** The x55 user-level stability histogram from the live user-cell
    * store — [[stableHistogram]]'s sibling at the user privacy unit.
    * Only key PRESENCE ships to the mechanism (the distinct set), so
    * the twin argument is idempotent union + the deterministic
    * cap/count/noise/τ tail.
    */
  def userHistogram(s: SparkSession, cfg: Config, seeded: Boolean = false,
      capCells: Int = 4, delta: Double = 1e-6,
      ledger: Option[DpLedger] = None, releaseId: String = "user_hist",
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpUserHistogramFromUserCells(
      // invert prepUserCells' length-prefix encoding. user_id stays a
      // STRING here (the mechanism uses it only as a grouping key —
      // the cap orders by (day, event_type) — so the release is
      // identical to the batch spelling over typed ids)
      LiveCounts.totals(s, userCellCfg(cfg), asOf)
        .select(to_timestamp(substring(col("key"), 1, 10)).as("day"),
          expr("substring(key, 12)").as("_rest"))
        .withColumn("_ulen", split(col("_rest"), "\\|", 2).getItem(0))
        .select(col("day"),
          expr("substring(_rest, length(_ulen) + 2, cast(_ulen as int))")
            .as("user_id"),
          expr("substring(_rest, length(_ulen) + 2 + cast(_ulen as int))")
            .as("event_type")),
      seeded, capCells, delta, ledger, releaseId)

  // ---- the subsampled twins (x56/x60) -----------------------------------

  // sibling KEPT-subsample stores: one per sample domain ('dpss|' for
  // the Laplace release, 'dpsg|' for the Gaussian — x60's independence
  // contract: running both releases must not correlate their
  // subsamples), keyed like the full-cell store
  private def subCellCfg(cfg: Config) = LiveCounts.Config(s"${cfg.root}/subcells")
  private def subgCellCfg(cfg: Config) = LiveCounts.Config(s"${cfg.root}/subgcells")

  /** The full-cell store's event types as the twins' vocabulary source
    * (the release set must derive from the FULL corpus, never the
    * sample — [[graft.operators.Privacy.dpSubsampledCountFromCells]]'s
    * contract), so a deployment running [[startCells]] gets the batch
    * default's semantics; one that doesn't must pass a public
    * `vocabulary` (the honest production spelling anyway).
    */
  private def cellTypes(s: SparkSession, cfg: Config, asOf: Long): DataFrame =
    LiveCounts.totals(s, cellCfg(cfg), asOf)
      .select(expr("substring(key, 12)").as("event_type"))

  private def prepSub(tag: String, samplingSalt: String, q: Double)(
      events: DataFrame): DataFrame =
    prepCells(events.filter(Privacy.subsampleKeep(tag, samplingSalt, q)))

  /** Continuous KEPT-subsample intake for [[subsampledCount]]. The
    * SAMPLING salt is deployment config fixed at ingest time (the
    * sample must be one draw across the stream's whole life — a salt
    * that changed between batches would splice two different samples
    * into one store); the default empty salt is the seeded/test
    * spelling, publicly recomputable like every seeded release, and
    * the amplification claim is vacuous under it
    * ([[graft.operators.Privacy.releaseSalt]]'s contract). Release-time
    * NOISE salts stay per-release draws exactly as in batch — in the
    * streaming spelling the two randomness sources are independent
    * secrets.
    */
  def startSubsampled(events: DataFrame, cfg: Config, q: Double = 0.5,
      samplingSalt: String = ""): StreamingQuery =
    LiveCounts.start(events, subCellCfg(cfg), prepSub("dpss|", samplingSalt, q))

  def stepSubsampled(events: DataFrame, batchId: Long, cfg: Config,
      q: Double = 0.5, samplingSalt: String = ""): Unit =
    LiveCounts.step(prepSub("dpss|", samplingSalt, q)(events), batchId,
      subCellCfg(cfg))

  def compactSubsampled(s: SparkSession, cfg: Config): Unit =
    LiveCounts.compact(s, subCellCfg(cfg))

  /** Continuous KEPT-subsample intake for [[subsampledGaussian]] — its
    * own store under the independent 'dpsg|' sample domain.
    */
  def startSubsampledGaussian(events: DataFrame, cfg: Config,
      q: Double = 0.5, samplingSalt: String = ""): StreamingQuery =
    LiveCounts.start(events, subgCellCfg(cfg), prepSub("dpsg|", samplingSalt, q))

  def stepSubsampledGaussian(events: DataFrame, batchId: Long, cfg: Config,
      q: Double = 0.5, samplingSalt: String = ""): Unit =
    LiveCounts.step(prepSub("dpsg|", samplingSalt, q)(events), batchId,
      subgCellCfg(cfg))

  def compactSubsampledGaussian(s: SparkSession, cfg: Config): Unit =
    LiveCounts.compact(s, subgCellCfg(cfg))

  /** The x56 subsampled count release from the live kept-cell store —
    * the amplification regime's streaming twin (after which EVERY
    * release regime has one: x47→release, x51→aboveThreshold,
    * x53→sparse, x54/x55→histograms, x56/x60→these). The keep decision
    * is per-event and deterministic given the ingest-time sampling
    * salt, kept-cell counts are additive, and the noise/clamp tail is
    * deterministic given the cells — live == batch bit-for-bit on the
    * same records (StreamingSpec pins it). The ledger charge is the
    * AMPLIFIED ε' exactly as in batch.
    */
  def subsampledCount(s: SparkSession, cfg: Config, q: Double = 0.5,
      seeded: Boolean = false, ledger: Option[DpLedger] = None,
      releaseId: String = "subsampled_count",
      vocabulary: Option[Seq[String]] = None,
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpSubsampledCountFromCells(
      subCells(s, subCellCfg(cfg), asOf), cellTypes(s, cfg, asOf),
      q, seeded, ledger, releaseId, vocabulary)

  /** The x60 subsampled GAUSSIAN release from its live kept-cell
    * store — [[subsampledCount]]'s sibling in (ε, δ) space; the charge
    * is the amplified PAIR against the δ-metered ledger, exactly as in
    * batch.
    */
  def subsampledGaussian(s: SparkSession, cfg: Config, q: Double = 0.5,
      seeded: Boolean = false, ledger: Option[DpLedger] = None,
      releaseId: String = "subsampled_gauss",
      vocabulary: Option[Seq[String]] = None,
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpSubsampledGaussianFromCells(
      subCells(s, subgCellCfg(cfg), asOf), cellTypes(s, cfg, asOf),
      q, seeded, ledger, releaseId, vocabulary)

  /** [[subsampledGaussian]] under the [[graft.operators.RdpAccountant]]
    * instead of the lemma-pair ledger — the live K-schedule spelling:
    * each release charges its (q, σ) Rényi footprint; the (ε, δ)
    * statement falls out once at the accountant's read time. Same
    * store, same sample, same noise as the pair-accounted twin.
    */
  def subsampledGaussianRdp(s: SparkSession, cfg: Config,
      accountant: graft.operators.RdpAccountant, q: Double = 0.5,
      seeded: Boolean = false, releaseId: String = "subsampled_gauss_rdp",
      vocabulary: Option[Seq[String]] = None,
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpSubsampledGaussianRdpFromCells(
      subCells(s, subgCellCfg(cfg), asOf), cellTypes(s, cfg, asOf),
      accountant, q, seeded, releaseId, vocabulary)

  // ---- the dense-count twins (x40/x49) ----------------------------------

  /** The x40 dense-grid count release from the live cell store (one
    * more consumer of the x54 store: additive cell counts +
    * deterministic grid/noise/clamp ⇒ live == batch). Vocabulary
    * contract per [[subsampledCount]].
    */
  def countRelease(s: SparkSession, cfg: Config, seeded: Boolean = false,
      ledger: Option[DpLedger] = None, releaseId: String = "count",
      vocabulary: Option[Seq[String]] = None,
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpCountFromCells(
      LiveCounts.totals(s, cellCfg(cfg), asOf)
        .select(to_timestamp(substring(col("key"), 1, 10)).as("day"),
          expr("substring(key, 12)").as("event_type"), col("n").as("true_n")),
      cellTypes(s, cfg, asOf), seeded, ledger, releaseId, vocabulary)

  /** The x49 user-level count release from the live user-cell store
    * (one more consumer of the x55 store: only key PRESENCE feeds the
    * mechanism, idempotent-union additive ⇒ live == batch).
    */
  def userCountRelease(s: SparkSession, cfg: Config, seeded: Boolean = false,
      capCells: Int = 4, ledger: Option[DpLedger] = None,
      releaseId: String = "user_count",
      vocabulary: Option[Seq[String]] = None,
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpUserCountFromUserCells(
      // invert prepUserCells' length-prefix encoding (the x55 parse)
      LiveCounts.totals(s, userCellCfg(cfg), asOf)
        .select(to_timestamp(substring(col("key"), 1, 10)).as("day"),
          expr("substring(key, 12)").as("_rest"))
        .withColumn("_ulen", split(col("_rest"), "\\|", 2).getItem(0))
        .select(col("day"),
          expr("substring(_rest, length(_ulen) + 2, cast(_ulen as int))")
            .as("user_id"),
          expr("substring(_rest, length(_ulen) + 2 + cast(_ulen as int))")
            .as("event_type")),
      cellTypes(s, cfg, asOf), seeded, capCells, ledger, releaseId, vocabulary)

  // ---- the selection-family twins (x43/x44/x64) -------------------------

  /** The x43 exponential-mechanism argmax from the live cell store —
    * the same store the x54 twin reads (cell counts are additive; the
    * dense grid × vocabulary and the Gumbel selection are
    * deterministic given them ⇒ live == batch). Vocabulary contract
    * per [[subsampledCount]]: the full-cell store's types, or an
    * explicit public list.
    */
  def argmaxRelease(s: SparkSession, cfg: Config, seeded: Boolean = false,
      ledger: Option[DpLedger] = None, releaseId: String = "argmax",
      vocabulary: Option[Seq[String]] = None,
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpArgmaxFromCells(
      LiveCounts.totals(s, cellCfg(cfg), asOf)
        .select(to_timestamp(substring(col("key"), 1, 10)).as("day"),
          expr("substring(key, 12)").as("event_type"), col("n").as("true_n")),
      cellTypes(s, cfg, asOf), seeded, ledger, releaseId, vocabulary)

  // value-bin store for the median/quantile twins: key = zero-padded
  // two-digit public bin FIRST (fixed width, so the type may contain
  // anything), assigned at ingest by the SAME Privacy.valueBin
  // spelling the batch releases use
  private def binCellCfg(cfg: Config) = LiveCounts.Config(s"${cfg.root}/valuebins")

  private def prepValueBins(events: DataFrame): DataFrame =
    events.select(concat(lpad(Privacy.valueBin.cast("string"), 2, "0"),
      lit("|"), col("event_type")).as("key"))

  def startValueBins(events: DataFrame, cfg: Config): StreamingQuery =
    LiveCounts.start(events, binCellCfg(cfg), prepValueBins)

  def stepValueBins(events: DataFrame, batchId: Long, cfg: Config): Unit =
    LiveCounts.step(prepValueBins(events), batchId, binCellCfg(cfg))

  def compactValueBins(s: SparkSession, cfg: Config): Unit =
    LiveCounts.compact(s, binCellCfg(cfg))

  private def binnedFromStore(s: SparkSession, cfg: Config,
      asOf: Long): DataFrame =
    LiveCounts.totals(s, binCellCfg(cfg), asOf)
      .select(expr("substring(key, 4)").as("event_type"),
        substring(col("key"), 1, 2).cast("int").as("bin"),
        col("n").as("c"))

  /** The x44 median from the live value-bin store (bin assignment at
    * ingest via the shared spelling, additive bin counts,
    * deterministic selection tail ⇒ live == batch).
    */
  def medianRelease(s: SparkSession, cfg: Config, seeded: Boolean = false,
      ledger: Option[DpLedger] = None, releaseId: String = "median",
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpMedianFromBinned(binnedFromStore(s, cfg, asOf),
      seeded, ledger, releaseId)

  /** The x64 quantile set from the same value-bin store —
    * [[medianRelease]]'s sibling with the monotonized public-set
    * output.
    */
  def quantileRelease(s: SparkSession, cfg: Config, seeded: Boolean = false,
      ledger: Option[DpLedger] = None, releaseId: String = "quantiles",
      quantiles: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9),
      asOf: Long = Long.MaxValue): DataFrame =
    Privacy.dpQuantilesFromBinned(binnedFromStore(s, cfg, asOf),
      seeded, ledger, releaseId, quantiles)

  // ---- the LOCAL-DP twin (x62) ------------------------------------------

  private def lrrCellCfg(cfg: Config) = LiveCounts.Config(s"${cfg.root}/lrrcells")

  /** One `(key = ISO-day|reported)` observation per RANDOMIZED record —
    * the k-RR coin runs HERE, at ingest, which is what the local model
    * means operationally: the store (and everything downstream) only
    * ever holds ε-locally-private reports, never a true type. The
    * response `domain` and the per-record coin salt are deployment
    * config fixed at collection time (the domain is part of the
    * mechanism — k enters (p, q); a domain that changed mid-stream
    * would splice two mechanisms into one store); the default empty
    * salt is the seeded/test spelling, publicly recomputable like
    * every seeded release ([[graft.operators.Privacy.releaseSalt]]).
    */
  private def prepLocal(domain: Seq[String], eps: Double, salt: String)(
      events: DataFrame): DataFrame =
    prepCells(Privacy.localRandomize(events, eps, salt, domain.distinct.sorted)
      .select(col("ts"), col("reported").as("event_type")))

  def startLocal(events: DataFrame, cfg: Config, domain: Seq[String],
      eps: Double = 1.0, samplingSalt: String = ""): StreamingQuery =
    LiveCounts.start(events, lrrCellCfg(cfg), prepLocal(domain, eps, samplingSalt))

  def stepLocal(events: DataFrame, batchId: Long, cfg: Config,
      domain: Seq[String], eps: Double = 1.0,
      samplingSalt: String = ""): Unit =
    LiveCounts.step(prepLocal(domain, eps, samplingSalt)(events), batchId,
      lrrCellCfg(cfg))

  def compactLocal(s: SparkSession, cfg: Config): Unit =
    LiveCounts.compact(s, lrrCellCfg(cfg))

  /** The x62 debiased frequency estimate from the live report store —
    * pure post-processing of already-ε-locally-private reports (no
    * ledger: the ε was spent per record at [[startLocal]]'s coin).
    * `domain`/`eps` must match the collector's config
    * ([[graft.operators.Privacy.localFrequencyFromReports]] carries
    * the unit-error warning); live == batch with the same domain and
    * salt (StreamingSpec pins it).
    */
  def localFrequency(s: SparkSession, cfg: Config, domain: Seq[String],
      eps: Double = 1.0, asOf: Long = Long.MaxValue): DataFrame =
    Privacy.localFrequencyFromReports(
      LiveCounts.totals(s, lrrCellCfg(cfg), asOf)
        .select(to_timestamp(substring(col("key"), 1, 10)).as("day"),
          expr("substring(key, 12)").as("reported"), col("n")),
      eps, domain)

  /** A kept-subsample store's totals in the FromCells cell schema. */
  private def subCells(s: SparkSession, ccfg: LiveCounts.Config,
      asOf: Long): DataFrame =
    LiveCounts.totals(s, ccfg, asOf)
      .select(to_timestamp(substring(col("key"), 1, 10)).as("day"),
        expr("substring(key, 12)").as("event_type"), col("n").as("true_n"))
}
