package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{Extract, ExtractConfig, Serve}
import graft.sinks.CheckpointSink
import graft.sources.Archive
import graft.streaming.ArchiveTail

/** User-facing facade: everything a user of the reference service runs
  * today, as one object (SURVEY.md §3 entry points).
  *
  * {{{
  *   val spark = Engine.session("local[8]")
  *   // Q0: collect — backfill everything available, then tail
  *   Engine.collect(spark, root, passphrase, ExtractConfig(issuer), sink)
  *   // Q1/Q2: serve from the collected layout
  *   Engine.paymentsBySource(collected, source, limit = 20)
  *   Engine.txByHash(collected, hash)
  * }}}
  */
object Engine {

  /** Session with this engine's functions, optimizer rule, and the
    * settings the correctness/bench harnesses use.
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("historycollectorspark")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s) // same-JVM reuse safety
    s
  }

  /** Q0 ingest: drain every available checkpoint, then tail with the
    * reference's bounded polling retry. Returns checkpoints committed.
    */
  def collect(
      spark: SparkSession,
      archiveRoot: String,
      passphrase: String,
      cfg: ExtractConfig,
      sink: CheckpointSink,
      firstSeq: Long = 0x3fL,
      tailIterations: Int = 0): Int = {
    val tail = new ArchiveTail(spark, archiveRoot, passphrase, cfg, sink, firstSeq)
    val backfilled = tail.runOnce()
    backfilled + (if (tailIterations > 0) tail.run(tailIterations) else 0)
  }

  /** Batch extraction over explicit archive files (no sink/offsets). */
  def extract(
      spark: SparkSession,
      txPaths: Seq[String],
      ledgerPaths: Seq[String],
      resultPaths: Seq[String],
      passphrase: String,
      cfg: ExtractConfig): DataFrame =
    Extract.operations(
      Archive.transactions(spark, txPaths, passphrase),
      Archive.ledgers(spark, ledgerPaths),
      Archive.results(spark, resultPaths),
      cfg)

  /** Q1: GET /payments?source=&limit= over a collected payments table. */
  def paymentsBySource(payments: DataFrame, source: String, limit: Int = 20): DataFrame =
    Serve.paymentsBySource(payments, source, limit)

  /** Q2: GET /tx?id= */
  def txByHash(payments: DataFrame, hash: String): DataFrame =
    Serve.txByHash(payments, hash)
}
