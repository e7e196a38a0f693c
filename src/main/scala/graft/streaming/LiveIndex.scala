package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.operators.Retrieval

/** Continuously-maintained sparse (BM25) retrieval index — the fourth
  * state shape of the streaming intakes, next to [[LivePipeline]]'s
  * membership sets, [[LiveVectors]]' vector index, and [[LiveCounts]]'
  * additive counts: an INVERTED INDEX whose batch spelling (x14
  * derives tf/dl/df/avgdl inline from one corpus explode) would be
  * corpus-shaped work per refresh under continuous ingest.
  *
  * The decomposition that makes BM25 incrementally maintainable: of
  * the statistics the score needs, tf and dl are PER-DOC (computable
  * from the arriving batch alone), while df, n_docs, and total_tokens
  * are corpus-wide but ADDITIVE over docs — so each micro-batch
  * commits only its own docs' posting rows `(word, doc_id, tf)` and
  * doc lengths `(doc_id, dl)`, and serving re-derives the additive
  * aggregates from the committed union, restricted to the query's
  * terms. No per-batch corpus work, no stored aggregate to keep
  * consistent.
  *
  * Store layout under `Config.root` (the [[BatchParts]] discipline):
  *   - `postings/batch=<id>` — `(word, doc_id, tf)` for the batch's
  *     docs, written FIRST;
  *   - `doclens/batch=<id>` — `(doc_id, dl)`, written LAST: its
  *     `_SUCCESS` is the batch's commit marker, so a crash between
  *     the two writes leaves a postings partition that serving never
  *     reads (only ids ≤ the newest doclens commit are served, and
  *     batch ids are monotone) and the replay overwrites.
  *
  * Serving cost at 100 TB: the postings scan is filtered to the query
  * terms — parquet row-group stats and dictionary pages prune
  * everything else — and the doclens side is one row per doc (the
  * same per-doc join the batch x14 plan pays). The scoring stage is
  * [[Retrieval.bm25FromIndex]], the SAME code the batch operator
  * runs, so live and batch rankings are bit-identical over equal
  * corpora (StreamingSpec pins it).
  */
object LiveIndex {

  final case class Config(root: String)

  private val PostingSchema = StructType(Seq(
    StructField("word", StringType),
    StructField("doc_id", LongType),
    StructField("tf", LongType)))
  private val DoclenSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dl", LongType)))

  /** Start the continuous intake over a streaming `(doc_id, text)`
    * frame (extra columns ignored); each micro-batch commits its own
    * docs' postings and lengths.
    */
  def start(docs: DataFrame, cfg: Config): StreamingQuery = {
    val fn: (DataFrame, Long) => Unit = (b, id) => step(b, id, cfg)
    docs.writeStream
      .option("checkpointLocation", s"${cfg.root}/_checkpoint")
      .foreachBatch(fn)
      .start()
  }

  /** One incremental step: drop already-indexed doc_ids (producer
    * retries under fresh batch ids — the [[LiveVectors.step]]
    * anti-join), tokenize exactly like the batch operator (split on
    * single spaces, empty tokens dropped), commit the batch's partial
    * index. Docs whose text yields no tokens index nothing — the same
    * absence the inline x14 spelling produces.
    */
  def step(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val s = batch.sparkSession
    Seq("postings", "doclens").foreach(k =>
      BatchParts.recoverFold(s, s"${cfg.root}/$k"))
    // ONE doclens listing serves the replay check and the id read
    val dlParts = BatchParts.effectiveParts(s, s"${cfg.root}/doclens")
    if (BatchParts.isCommittedIn(dlParts, batchId)) return
    if (batch.isEmpty) return
    val indexed = dlParts.map(_._2) match {
      case Seq() => batch.limit(0).select("doc_id")
      case dirs => s.read.schema(DoclenSchema).parquet(dirs: _*).select("doc_id")
    }
    // the token explode feeds both commits — cache it so each batch
    // tokenizes once, not twice. Tombstoned ids are excluded too: an
    // arrival of a forgotten id stays dropped until the tombstones are
    // retired, so the compact-crash window (rows applied, tombstones
    // not yet deleted) can never erase a legitimately re-admitted doc
    // — nothing is admitted under a live tombstone.
    val toks = batch.dropDuplicates("doc_id")
      .join(indexed, Seq("doc_id"), "left_anti")
      .join(broadcast(tombstones(s, cfg)), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      toks.groupBy("word", "doc_id").agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(s"${cfg.root}/postings/batch=$batchId")
      toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        .write.mode("overwrite").parquet(s"${cfg.root}/doclens/batch=$batchId")
    } finally { toks.unpersist(); () }
  }

  /** A store as one multi-path relation over effective parts with id
    * ≤ `upTo` ([[BatchParts.effectiveParts]], one listing; fold
    * horizons are always ≤ the last commit, hence ≤ `upTo`). Safe
    * under concurrent maintenance: folds commit by rename and
    * superseded dirs are only GC'd from the next writer op.
    */
  private def readStore(s: SparkSession, dir: String, schema: StructType,
      upTo: Long): DataFrame = {
    val dirs = BatchParts.effectiveParts(s, dir).filter(_._1 <= upTo).map(_._2)
    if (dirs.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    else s.read.schema(schema).parquet(dirs: _*)
  }

  /** Last committed batch id (the serving horizon), if any — the
    * newest effective doclens part's id. (Under the rename-commit
    * protocol the listing is never transiently empty mid-fold: the
    * old delete→rename window, where a reader could see no committed
    * dirs and answer "no horizon", no longer exists.)
    */
  private def horizon(s: SparkSession, cfg: Config): Option[Long] =
    BatchParts.effectiveParts(s, s"${cfg.root}/doclens").lastOption.map(_._1)

  private val TombSchema = StructType(Seq(StructField("doc_id", LongType)))

  /** Right-to-be-forgotten for the INDEX: unlike [[LivePipeline]]'s
    * dedup stores (which deliberately RETAIN forgotten hashes so a
    * later copy stays rejected), an index SERVES content — a
    * forgotten doc must leave the results, and because BM25's corpus
    * statistics are additive over docs, masking its rows makes every
    * remaining score EXACTLY what a from-scratch index over the
    * surviving corpus would compute (df, n_docs, total_tokens all
    * shrink by the doc's contribution — parity spec'd). Tombstones
    * are a tiny keyed table anti-joined into both store reads;
    * [[compact]] applies them physically and retires the applied
    * partitions, bounding the mask.
    */
  def forget(s: SparkSession, cfg: Config, docIds: Seq[Long]): Unit = {
    val next = BatchParts.committed(s, s"${cfg.root}/tombstones")
      .lastOption.map(_._1 + 1).getOrElse(0L)
    import scala.jdk.CollectionConverters._
    s.createDataFrame(docIds.map(Row(_)).asJava, TombSchema)
      .write.mode("overwrite").parquet(s"${cfg.root}/tombstones/batch=$next")
  }

  private def tombstones(s: SparkSession, cfg: Config): DataFrame = {
    val dirs = BatchParts.committed(s, s"${cfg.root}/tombstones").map(_._2)
    if (dirs.isEmpty) s.createDataFrame(s.sparkContext.emptyRDD[Row], TombSchema)
    else s.read.schema(TombSchema).parquet(dirs: _*)
  }

  /** Top-`n` BM25 over the live index for keyword query `terms` — the
    * x14 serving surface from the continuously-maintained store.
    * Postings of the last attempted-but-uncommitted batch (crash
    * between the two store writes) are excluded by the doclens
    * horizon; everything else is [[Retrieval.bm25FromIndex]].
    */
  def bm25(s: SparkSession, cfg: Config, terms: Seq[String], n: Int,
      k1: Double = Retrieval.K1, b: Double = Retrieval.B): DataFrame = {
    val h = horizon(s, cfg).getOrElse(Long.MinValue)
    val tomb = broadcast(tombstones(s, cfg))
    val dl = readStore(s, s"${cfg.root}/doclens", DoclenSchema, h)
      .join(tomb, Seq("doc_id"), "left_anti")
    val tf = readStore(s, s"${cfg.root}/postings", PostingSchema, h)
      .filter(col("word").isin(terms: _*))
      .select("doc_id", "word", "tf")
      .join(tomb, Seq("doc_id"), "left_anti")
    Retrieval.bm25FromIndex(tf, dl, k1, b)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(n)
  }

  /** Fold each store's committed partitions (ids ≤ the doclens
    * horizon) into one — the small-files maintenance, staged
    * roll-forward crash-safe via [[BatchParts]]. Key-deduped on fold:
    * transient duplicate rows cannot arise from the commit protocol
    * (the anti-join in [[step]] plus replay-overwrites), but a fold is
    * the place to make that a guarantee rather than an inference.
    * The two folds are independent relations — a crash between them
    * leaves one folded and one not, which readers assemble
    * identically.
    *
    * Compaction is also where [[forget]]'s tombstones are applied
    * PHYSICALLY (the fold anti-joins them out) and then retired —
    * only the partitions read at entry, and only after both folds:
    * a crash between the folds leaves the tombstones in place, still
    * masking the unfolded store, and the re-run's anti-join on the
    * already-clean store is a no-op. Until a compaction applies them,
    * a re-arrival of a forgotten doc_id is dropped like any
    * already-indexed id (the store row still exists, masked); after
    * retirement the id is free to be indexed anew.
    */
  def compact(s: SparkSession, cfg: Config): Unit = {
    // recovery FIRST, horizon after: crash-debt folds (a staging
    // committed but not yet renamed) must become visible parts before
    // the horizon is read, or the body would fold against a view that
    // a moment later gains a whole fold
    Seq("postings", "doclens").foreach(k =>
      BatchParts.recoverFold(s, s"${cfg.root}/$k"))
    horizon(s, cfg).foreach { h =>
      val tombParts = BatchParts.committed(s, s"${cfg.root}/tombstones")
      val tomb = broadcast(tombstones(s, cfg))
      for ((kind, schema, keys) <- Seq(
          ("postings", PostingSchema, Seq("word", "doc_id")),
          ("doclens", DoclenSchema, Seq("doc_id")))) {
        val dir = s"${cfg.root}/$kind"
        val parts = BatchParts.effectiveParts(s, dir).filter(_._1 <= h)
        if (parts.length > 1 || (parts.nonEmpty && tombParts.nonEmpty)) {
          val hk = parts.last._1
          val gen = BatchParts.nextFoldGen(s, dir)
          s.read.schema(schema).parquet(parts.map(_._2): _*)
            .dropDuplicates(keys)
            .join(tomb, Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(BatchParts.stagingPath(dir, hk, gen))
          BatchParts.commitFold(s, dir, hk, gen)
        }
      }
      val fs = new org.apache.hadoop.fs.Path(cfg.root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      tombParts.foreach { case (_, p) =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true); ()
      }
    }
  }
}
