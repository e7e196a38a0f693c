package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incrementally-maintained ADDITIVE corpus statistics — the third
  * state shape of the streaming intakes, next to [[LivePipeline]]'s
  * membership sets and [[LiveVectors]]' vector index: keyed counts
  * (term frequencies, segment dfs, LM tables) whose batch spellings
  * are corpus-wide aggregations a stream cannot see.
  *
  * The store is the additive-merge trick made durable: each committed
  * batch writes only its OWN partial aggregate `(key, n)` under
  * `counts/batch=<id>` (batch-sized, map-side combinable), and the
  * corpus-wide totals are `groupBy(key).sum(n)` over the committed
  * partitions — associativity means per-batch partials plus one
  * re-aggregation ARE the batch answer, bit-for-bit for integer
  * counts. [[compact]] folds history by the same re-aggregation
  * (crash-safe staged roll-forward, [[LiveVectors.compact]]'s
  * discipline — the batch dir's `_SUCCESS` is the commit marker, so
  * an uncommitted dir is invisible to the fold by construction).
  *
  * This is how the batch-built model tables the stateless streaming
  * operators ship as literals (d12's hot-segment list, x10/x17's LM
  * counts — StreamDemos) stay FRESH under continuous ingest: the
  * stream maintains the partials; model rebuilds read `totals` at
  * index cadence instead of rescanning the corpus. At 100 TB the
  * recurring cost is one batch-sized combinable aggregate per
  * micro-batch; the corpus-shaped work (the totals re-aggregation)
  * happens only at read/fold cadence, over key-sized — not
  * corpus-sized — partials.
  */
object LiveCounts {

  final case class Config(root: String)

  private val CountSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("n", LongType),
    StructField("batch", LongType)))

  /** Start the continuous intake over a streaming `(key)` frame —
    * one row per OBSERVATION (pre-exploded by the caller: words,
    * segments, n-grams...); each micro-batch commits its partial
    * counts.
    */
  def start(keys: DataFrame, cfg: Config): StreamingQuery = {
    val fn: (DataFrame, Long) => Unit = (b, id) => step(b, id, cfg)
    keys.writeStream
      .option("checkpointLocation", s"${cfg.root}/_checkpoint")
      .foreachBatch(fn)
      .start()
  }

  /** One incremental step: the batch's partial aggregate, committed as
    * its own partition (replay overwrites it — exactly-once).
    */
  def step(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val s = batch.sparkSession
    recoverCompaction(s, cfg)
    if (BatchParts.committed(s, s"${cfg.root}/counts").exists(_._1 == batchId)) return
    if (batch.isEmpty) return
    batch.groupBy("key").agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"${cfg.root}/counts/batch=$batchId")
  }

  /** Corpus-wide totals: one re-aggregation over the committed
    * partials. Associative, so folded and unfolded state sum to the
    * same batch answer; interrupted folds are completed before the
    * read.
    */
  def totals(s: SparkSession, cfg: Config): DataFrame = {
    // complete an interrupted fold first: a compaction that crashed
    // mid-delete would otherwise read as silent undercounts
    recoverCompaction(s, cfg)
    BatchParts.committed(s, s"${cfg.root}/counts").map(_._2)
  } match {
      case Seq() => s.createDataFrame(s.sparkContext.emptyRDD[Row],
        StructType(CountSchema.dropRight(1)))
      case dirs => s.read.option("basePath", s"${cfg.root}/counts")
        .schema(CountSchema).parquet(dirs: _*)
        .groupBy("key").agg(sum(col("n")).as("n"))
    }

  /** Fold committed partials into one partition (the re-aggregation is
    * the merge), staged-roll-forward crash-safe.
    */
  def compact(s: SparkSession, cfg: Config): Unit = {
    recoverCompaction(s, cfg)
    val parts = BatchParts.committed(s, s"${cfg.root}/counts")
    if (parts.length > 1) {
      val m = parts.last._1
      s.read.option("basePath", s"${cfg.root}/counts").schema(CountSchema)
        .parquet(parts.map(_._2): _*)
        .groupBy("key").agg(sum(col("n")).as("n"))
        .write.mode("overwrite").parquet(s"${cfg.root}/counts/.compact-$m")
      rollForward(s, cfg, m)
    }
  }

  private def recoverCompaction(s: SparkSession, cfg: Config): Unit = {
    val dir = new Path(s"${cfg.root}/counts")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(".compact-"))
      .foreach { st =>
        val m = st.getPath.getName.stripPrefix(".compact-").toLong
        if (fs.exists(new Path(st.getPath, "_SUCCESS"))) rollForward(s, cfg, m)
        else { fs.delete(st.getPath, true); () }
      }
  }

  private def rollForward(s: SparkSession, cfg: Config, m: Long): Unit = {
    val fs = new Path(cfg.root).getFileSystem(s.sparkContext.hadoopConfiguration)
    BatchParts.committed(s, s"${cfg.root}/counts").filter(_._1 <= m)
      .foreach { case (_, p) => fs.delete(new Path(p), true); () }
    fs.rename(new Path(s"${cfg.root}/counts/.compact-$m"),
      new Path(s"${cfg.root}/counts/batch=$m"))
    ()
  }
}
