package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Full-fidelity custom Structured Streaming source for the history
  * archive (SURVEY.md §7.5 "sequenced micro-batch source"): the offset IS
  * the reference's 8-hex checkpoint sequence, advancing in strides of 64
  * (python/main.py:205-228), so Spark's offset log replaces `lastfile`
  * natively and restarts resume exactly-once.
  *
  * Each emitted row is one checkpoint triple: (seq, transactions bytes,
  * ledger bytes, results bytes). Decode + extraction stay in the normal
  * declarative plan downstream (foreachBatch → graft.pipeline.Extract),
  * keeping the source a pure availability/offset concern.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.ArchiveStreamProvider")
  *     .option("root", root).option("firstSeq", "63")
  *     .option("maxPerBatch", "128").load()
  * }}}
  */
/** Java-serializable Hadoop Configuration carrier: the DSv2 reader
  * factory ships the SESSION's Hadoop conf to executors, so
  * `spark.hadoop.fs.s3a.*` credentials/endpoints set on the session
  * reach the archive reads — a bare `new Configuration()` silently
  * drops them, which is exactly the pitfall PartitionedFileSink's
  * scaladoc documents for the sink side.
  */
private[sources] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object ArchiveStreamTable {
  val Schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("transactions", BinaryType, nullable = false),
    StructField("ledger", BinaryType, nullable = false),
    StructField("results", BinaryType, nullable = false)))
}

class ArchiveStreamProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ArchiveStreamTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArchiveStreamTable(properties)
}

class ArchiveStreamTable(props: util.Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"archive(${props.get("root")})"
  override def schema(): StructType = ArchiveStreamTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      // the SESSION's Hadoop conf (spark.hadoop.* settings included),
      // captured at plan time on the driver and threaded to every
      // FileSystem resolution — driver-side availability walks and
      // executor-side partition reads alike
      private val conf = new SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf())
      override def readSchema(): StructType = ArchiveStreamTable.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ArchiveMicroBatchStream(
          options.get("root"),
          Option(options.get("firstSeq")).map(_.toLong).getOrElse(0x3fL),
          Option(options.get("maxPerBatch")).map(_.toInt).getOrElse(64),
          conf)
      // batch path (`spark.read.format(...)`): one InputPartition per
      // currently-available checkpoint, same executor-side reader as the
      // stream — backfill parallelism = number of archive triples
      override def toBatch: Batch = new ArchiveBatch(
        options.get("root"),
        Option(options.get("firstSeq")).map(_.toLong).getOrElse(0x3fL),
        conf)
    }
}

/** Batch scan of every checkpoint available at plan time (the DSv2 form
  * of [[ArchiveTail.runOnce]]'s availability walk).
  */
class ArchiveBatch(root: String, firstSeq: Long,
    conf: SerializableHadoopConf) extends Batch {
  require(Archive.isCheckpoint(firstSeq), s"firstSeq $firstSeq must satisfy (seq+1)%64==0")

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = new HPath(root).getFileSystem(conf.value)
    def available(seq: Long): Boolean =
      Seq("transactions", "ledger", "results")
        .forall(c => fs.exists(new HPath(Archive.pathFor(root, c, seq))))
    Iterator.iterate(firstSeq)(Archive.nextSeq)
      .takeWhile(available)
      .map(seq => ArchivePartition(root, seq): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveReaderFactory(conf)
}

/** Offset = highest checkpoint sequence already committed (exclusive
  * start of the next batch); JSON form is the decimal sequence.
  */
case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

class ArchiveMicroBatchStream(root: String, firstSeq: Long, maxPerBatch: Int,
    conf: SerializableHadoopConf) extends MicroBatchStream with SupportsTriggerAvailableNow {
  require(Archive.isCheckpoint(firstSeq), s"firstSeq $firstSeq must satisfy (seq+1)%64==0")

  @transient private lazy val fs: FileSystem =
    new HPath(root).getFileSystem(conf.value)

  private def available(seq: Long): Boolean =
    Seq("transactions", "ledger", "results")
      .forall(c => fs.exists(new HPath(Archive.pathFor(root, c, seq))))

  /** Before the first checkpoint: one stride below it (exclusive). */
  override def initialOffset(): Offset = SeqOffset(firstSeq - 64)

  override def latestOffset(): Offset = {
    // walk forward from nothing-committed-yet; Spark passes progress via
    // planInputPartitions(start,...), so track the scan frontier lazily:
    // we only need "highest available", bounded per batch for pacing.
    var last = lastSeen
    var n = 0
    while (n < maxPerBatch && available(Archive.nextSeq(last)) &&
        availableNowCap.forall(Archive.nextSeq(last) <= _)) {
      last = Archive.nextSeq(last); n += 1
    }
    lastSeen = last
    SeqOffset(last)
  }
  // frontier cache: starts at initial; latestOffset only moves forward,
  // matching the strictly-ordered archive contract.
  @volatile private var lastSeen: Long = firstSeq - 64

  // ── Trigger.AvailableNow (proper multi-batch drain): snapshot the
  //    highest currently-available checkpoint; subsequent batches are
  //    paced by maxPerBatch but never read past the snapshot, so the
  //    query stops at exactly the data that existed at start.
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    var last = lastSeen
    while (available(Archive.nextSeq(last))) last = Archive.nextSeq(last)
    availableNowCap = Some(last)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerBatch.toLong)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SeqOffset].seq
    if (s > lastSeen) lastSeen = s
    latestOffset()
  }

  override def reportLatestOffset(): Offset = SeqOffset(lastSeen)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    ((s + 64) to e by 64).map(seq => ArchivePartition(root, seq): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArchiveReaderFactory(conf)

  override def deserializeOffset(json: String): Offset = {
    val o = SeqOffset(json.trim.toLong)
    if (o.seq > lastSeen) lastSeen = o.seq // restart: resume frontier
    o
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ArchivePartition(root: String, seq: Long) extends InputPartition

class ArchiveReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ArchivePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = !done
      override def get(): InternalRow = {
        done = true
        val fs = new HPath(p.root).getFileSystem(conf.value)
        def read(cat: String): Array[Byte] = {
          val in = fs.open(new HPath(Archive.pathFor(p.root, cat, p.seq)))
          try {
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](65536)
            var n = in.read(buf)
            while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
            out.toByteArray
          } finally in.close()
        }
        new GenericInternalRow(Array[Any](
          p.seq, read("transactions"), read("ledger"), read("results")))
      }
      override def close(): Unit = ()
    }
  }
}

/** Driver for the custom source: per micro-batch, decodes the triple
  * columns ON EXECUTORS (the archive bytes never transit the driver — the
  * only thing collected is the batch's list of checkpoint sequences, a
  * handful of longs), runs the extraction plan per checkpoint, and commits
  * through a [[graft.sinks.CheckpointSink]] in strict sequence order
  * (replays are idempotent per seq; Spark's offset log provides resume).
  *
  * The batch is persisted once so the per-seq filter jobs re-read cached
  * partitions instead of re-fetching archive files; each per-seq plan is
  * `filter(seq) → mapPartitions(decode)` — the same executor-side decode
  * path as the batch [[Archive]] readers.
  */
object ArchiveStreamRunner {
  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.Trigger
  import graft.pipeline.{Extract, ExtractConfig, LedgerEntry, TxHistoryEntry, TxResultEntry}
  import graft.sinks.CheckpointSink

  /** Decode + extract + commit one micro-batch (the shared foreachBatch
    * body of both runners).
    */
  private def drainBatch(
      batch: DataFrame, passphrase: String, cfg: ExtractConfig, sink: CheckpointSink): Unit = {
    val cached = batch.persist()
    try {
      // seq longs only — content columns stay distributed.
      val seqs = cached.select("seq")
        .as[Long](Encoders.scalaLong).collect().sorted
      seqs.foreach { seq =>
        val one = cached.filter(org.apache.spark.sql.functions.col("seq") === seq)
        def bytes(c: String) = one.select(c).as[Array[Byte]](Encoders.BINARY)
        val txs = bytes("transactions").mapPartitions(
          _.flatMap(b => graft.xdr.Stellar.decodeTxEntries(Archive.gunzip(b), passphrase)))(
          Encoders.product[TxHistoryEntry])
        val ledgers = bytes("ledger").mapPartitions(
          _.flatMap(b => graft.xdr.Stellar.decodeLedgerEntries(Archive.gunzip(b))))(
          Encoders.product[LedgerEntry])
        val results = bytes("results").mapPartitions(
          _.flatMap(b => graft.xdr.Stellar.decodeResultEntries(Archive.gunzip(b))))(
          Encoders.product[TxResultEntry])
        sink.save(Extract.operations(txs, ledgers, results, cfg), seq)
      }
    } finally { cached.unpersist(); () }
  }

  private def stream(spark: SparkSession, root: String, firstSeq: Long): DataFrame =
    spark.readStream
      .format("graft.sources.ArchiveStreamProvider")
      .option("root", root)
      .option("firstSeq", firstSeq.toString)
      .load()

  def runAvailableNow(
      spark: SparkSession,
      root: String,
      passphrase: String,
      cfg: ExtractConfig,
      sink: CheckpointSink,
      checkpointDir: String,
      firstSeq: Long = 0x3fL): Unit = {
    val q = stream(spark, root, firstSeq).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((batch: DataFrame, _: Long) => drainBatch(batch, passphrase, cfg, sink))
      .start()
    q.awaitTermination()
  }

  /** Live tail on the DSv2 source (the reference's continuous main loop,
    * python/main.py:254-309, as a ProcessingTime streaming query): polls
    * the archive every `intervalMs`, each micro-batch draining whatever
    * new checkpoints `latestOffset` finds. Returns the running query —
    * the caller owns its lifecycle (`stop()`/`awaitTermination`); Spark's
    * offset log + the sink's committed-sequence check give the same
    * exactly-once resume as the AvailableNow path.
    */
  def runProcessingTime(
      spark: SparkSession,
      root: String,
      passphrase: String,
      cfg: ExtractConfig,
      sink: CheckpointSink,
      checkpointDir: String,
      firstSeq: Long = 0x3fL,
      intervalMs: Long = 1000L): org.apache.spark.sql.streaming.StreamingQuery =
    stream(spark, root, firstSeq).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch((batch: DataFrame, _: Long) => drainBatch(batch, passphrase, cfg, sink))
      .start()
}
