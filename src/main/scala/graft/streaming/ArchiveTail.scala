package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import graft.pipeline.{Extract, ExtractConfig}
import graft.sinks.CheckpointSink
import graft.sources.Archive

/** The reference's ingest loop (python/main.py:231-309) on Spark: strictly
  * ordered checkpoint-at-a-time processing with atomic data+offset commit
  * and bounded polling retry.
  *
  * Semantics preserved: resume from `lastfile`+64 (:246-249); one archive
  * triple per iteration (:254-283); a missing file blocks the tail
  * (poll + retry, :88-105); the sink's `save(df, seq)` is the atomic
  * commit (K2/K4).
  *
  * Scale: each iteration's decode + extract runs distributed (the triple
  * fans out over executors); for bulk BACKFILL call [[backfill]], which
  * feeds ALL available checkpoints to one Spark job — decode parallelism
  * = number of archive files — and only then starts tailing. The tail
  * itself is inherently sequential because the reference's offset
  * contract (one `lastfile` pointer) is.
  */
final class ArchiveTail(
    spark: SparkSession,
    root: String,
    passphrase: String,
    cfg: ExtractConfig,
    sink: CheckpointSink,
    firstSeq: Long = 0x3fL,
    maxRetries: Int = 5,
    pollMillis: Long = 180000L,
    sleeper: Long => Unit = Thread.sleep,
    alerts: IngestAlerts = IngestAlerts.Noop,
    metrics: IngestMetrics = IngestMetrics.Noop) {

  // Startup probe (K6): a misconfigured sink must fail here, before any
  // ingest work — the reference runs the same dry-run at adapter init
  // (python/adapters/s3_storage_adapter.py:169-192).
  sink.selfTest()

  private val fs: FileSystem =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Next sequence to process (offset recovery, S5). `lastfile ==
    * firstSeq` resumes AT firstSeq, not past it — the reference's
    * build_database seeds lastfile with FIRST_FILE meaning "not yet
    * ingested" (main.py:247 only advances when they differ), so a
    * bootstrap-seeded deployment must ingest its first checkpoint
    * rather than silently skip the first 64 ledgers. The sinks make
    * the re-visit exactly-once: the JDBC saves overwrite this batch's
    * row identities when lastfile == seq, and the file sink's
    * partition overwrite is idempotent — so the one genuinely-
    * ambiguous restart (crash right after ingesting firstSeq) re-lands
    * identical data instead of duplicating it (the reference itself
    * double-inserts in that window).
    */
  def resumeSeq: Long = sink.lastSequence match {
    case Some(l) if l == firstSeq && firstSeqSeeded => firstSeq
    case Some(l) => Archive.nextSeq(l)
    case None => firstSeq
  }

  // STARTUP-ONLY reading of the seeded pointer (the reference checks
  // lastfile == FIRST_FILE once, before its loop — main.py:246-249):
  // cleared after the first successful commit, so once firstSeq is
  // genuinely ingested the tail advances past it instead of
  // re-resolving the ambiguous pointer every poll round
  @volatile private var firstSeqSeeded: Boolean =
    sink.lastSequence.contains(firstSeq)

  private def triple(seq: Long): Seq[String] =
    Seq("transactions", "ledger", "results").map(Archive.pathFor(root, _, seq))

  private def available(seq: Long): Boolean = triple(seq).forall(p => fs.exists(new HPath(p)))

  /** Process exactly one checkpoint if its triple is present. */
  def processOne(seq: Long): Boolean = {
    if (!available(seq)) return false
    val Seq(txP, ledP, resP) = triple(seq)
    val ops = Extract.operations(
      Archive.transactions(spark, Seq(txP), passphrase),
      Archive.ledgers(spark, Seq(ledP)),
      Archive.results(spark, Seq(resP)),
      cfg)
    if (metrics ne IngestMetrics.Noop) {
      // per-commit counts (hc_storage_adapter.py:47-58 logging parity).
      // Persist so the counting agg reuses the partitions the save
      // already computed instead of re-running gunzip + XDR decode +
      // extraction from the raw archive bytes a second time.
      val cached = ops.persist()
      try {
        sink.save(cached, seq)
        val counts = cached.groupBy("type").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        metrics.onCommit(seq,
          counts.getOrElse("payment", 0L), counts.getOrElse("creation", 0L))
      } finally { cached.unpersist(); () }
    } else sink.save(ops, seq)
    firstSeqSeeded = false // the pointer now reflects a real commit
    true
  }

  /** Drain every currently available checkpoint in order; returns how many
    * were committed (Trigger.AvailableNow analogue).
    */
  def runOnce(): Int = {
    var n = 0
    var seq = resumeSeq
    while (processOne(seq)) { n += 1; seq = Archive.nextSeq(seq) }
    n
  }

  /** Tail with the reference's bounded retry: on a missing checkpoint,
    * sleep `pollMillis` and retry up to `maxRetries` times before giving
    * up (python/main.py:88-105, 295-309). `maxIterations` bounds the loop
    * for tests; pass Int.MaxValue for a real tail.
    *
    * Alert contract (python/main.py:286-309): `alerts.onDelay` fires on
    * the FIRST miss of a delay episode only; `alerts.onGiveUp` fires once
    * when retries exhaust, just before the tail stops. Alert transport
    * failures are logged and swallowed — alerting must never kill ingest.
    */
  def run(maxIterations: Int): Int = {
    def alert(f: => Unit): Unit =
      try f catch {
        case e: Exception =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"ingest alert callback failed: ${e.getMessage}")
      }
    var n = 0
    var retries = 0
    var iter = 0
    while (iter < maxIterations && retries <= maxRetries) {
      iter += 1
      if (processOne(resumeSeq)) { n += 1; retries = 0 }
      else {
        if (retries == 0) alert(alerts.onDelay(resumeSeq))
        retries += 1
        if (retries <= maxRetries) sleeper(pollMillis)
        else alert(alerts.onGiveUp(resumeSeq, retries))
      }
    }
    n
  }
}
