package graft.streaming

import java.util.concurrent.ConcurrentLinkedDeque
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch throughput/latency telemetry for the live intakes —
  * the operational signal the admission dashboard cannot give (fates
  * say WHAT was admitted; this says how fast batches are clearing and
  * whether trigger latency is trending up, the first symptom of store
  * reads outgrowing their compaction cadence).
  *
  * A [[StreamingQueryListener]] feeding a bounded ring buffer:
  * Spark's listener bus already computes per-trigger progress
  * (input rows, per-phase durations) for every streaming query, so
  * recording it costs no extra Spark jobs — unlike deriving the same
  * numbers from the audit store, which would re-scan committed
  * partitions per poll. The ring is driver-memory only and bounded
  * (default 256 entries ≈ the recent operational window); long-term
  * history belongs to the audit/cursor stores, which persist anyway.
  *
  * The bus delivers events ASYNCHRONOUSLY — a metric for batch N may
  * trail `processAllAvailable()` returning, so readers poll (the
  * `/metrics` endpoint semantics: "recent progress", not "commit
  * state"; commit state is `/progress`).
  */
final class IntakeMetrics(maxEntries: Int = 256) extends StreamingQueryListener {
  import IntakeMetrics.BatchMetric

  private val ring = new ConcurrentLinkedDeque[BatchMetric]
  // ConcurrentLinkedDeque.size is an O(n) traversal; the bound check
  // runs on the shared listener-bus thread for every query on the
  // session, so track the count in O(1) beside the deque
  private val count = new java.util.concurrent.atomic.AtomicInteger(0)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    ring.addLast(BatchMetric(p.id.toString, p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L),
      p.timestamp))
    // bound the ring; a slight transient overshoot under concurrent
    // appends is harmless (the next append trims again)
    var n = count.incrementAndGet()
    while (n > maxEntries) {
      if (ring.pollFirst() != null) n = count.decrementAndGet()
      else n = count.get()
    }
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  /** Oldest-first recent progress, across every query on the bus. */
  def snapshot: Seq[BatchMetric] = {
    import scala.jdk.CollectionConverters._
    ring.iterator.asScala.toSeq
  }

  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}

object IntakeMetrics {

  /** One trigger's progress: `triggerMs` is Spark's end-to-end trigger
    * execution time (offset resolution + the foreachBatch step +
    * commit), `timestamp` the trigger's ISO-8601 start.
    */
  final case class BatchMetric(queryId: String, batchId: Long,
      inputRows: Long, triggerMs: Long, timestamp: String)

  /** Construct and register on the session's listener bus. */
  def attach(spark: SparkSession, maxEntries: Int = 256): IntakeMetrics = {
    val m = new IntakeMetrics(maxEntries)
    spark.streams.addListener(m)
    m
  }
}
