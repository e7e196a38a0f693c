package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.Cols
import graft.operators.Similarity

/** Streaming ANN-index maintenance: the n2 sign-LSH serving path with
  * its bucket-partitioned signature store built CONTINUOUSLY from an
  * arriving embedding stream — the vector-side sibling of
  * [[LivePipeline]] (a training-data engine ingests embeddings at the
  * same cadence as documents; rebuilding the index per batch would be
  * corpus-shaped work for batch-sized news).
  *
  * Store layout under `Config.root`:
  *   - `planes/` — the hyperplane dim, written ONCE at seed time: the
  *     planes are the index's identity (a signature is only comparable
  *     to signatures under the same planes), so they are frozen before
  *     the first batch and every later batch and every query reads the
  *     same store;
  *   - `sigs/batch=<id>/bucket=<b>/` — per-batch signature partitions,
  *     bucket-partitioned WITHIN the batch dir. The batch dir's own
  *     `_SUCCESS` is the commit marker (single store — no multi-store
  *     commit ordering needed), and a replayed batch id overwrites only
  *     its own partition: the [[LivePipeline]] exactly-once discipline.
  *
  * Serving reads the committed batch dirs as ONE partitioned relation
  * (basePath + explicit schema), so `batch` and `bucket` both come back
  * as partition columns and a query's bucket predicate PRUNES at the
  * directory level across every batch — the scan stays ~corpus/2^bits
  * no matter how many batches built the index (pinned in ScaleSpec).
  * Arriving vec_ids already in the committed index are dropped
  * (producer retries with fresh batch ids), via an anti-join whose
  * store side is a vec_id-only column-pruned scan.
  */
object LiveVectors {

  final case class Config(root: String)

  private val NumPlanes = 8

  /** Data columns; `bucket` (string — inference would read "00101101"
    * back as an integer and drop leading zeros, the Similarity.SigSchema
    * lesson) and `batch` are partition columns and typed here so
    * discovery cannot mis-infer them.
    */
  private val SigSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType),
    StructField("norm", DoubleType),
    StructField("bucket", StringType),
    StructField("batch", LongType)))
  private val PlaneSchema = StructType(Seq(
    StructField("hid", LongType),
    StructField("hv", ArrayType(FloatType))))

  /** Start the continuous intake over a streaming `(vec_id, embedding,
    * label)` frame, freezing `planes` (`hid`, `hv` — `NumPlanes` rows)
    * as the index's hyperplane dim if none is stored yet.
    */
  def start(vectors: DataFrame, planes: DataFrame, cfg: Config): StreamingQuery = {
    ensurePlanes(planes, cfg)
    val fn: (DataFrame, Long) => Unit = (b, id) => step(b, id, cfg)
    vectors.writeStream
      .option("checkpointLocation", s"${cfg.root}/_checkpoint")
      .foreachBatch(fn)
      .start()
  }

  /** Freeze the hyperplane dim — first writer wins, later calls are
    * no-ops (re-planing would silently orphan every stored signature).
    */
  def ensurePlanes(planes: DataFrame, cfg: Config): Unit = {
    val dir = new Path(s"${cfg.root}/planes")
    val fs = dir.getFileSystem(planes.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir, "_SUCCESS")))
      planes.write.mode("overwrite").parquet(dir.toString)
  }

  private def planesOf(s: SparkSession, cfg: Config): DataFrame =
    s.read.schema(PlaneSchema).parquet(s"${cfg.root}/planes")

  /** One incremental step: drop already-indexed ids, sign the batch
    * against the frozen planes (same [[Similarity.signaturesOf]]
    * spelling as the batch store build), append one bucket-partitioned
    * batch dir.
    */
  def step(batch: DataFrame, batchId: Long, cfg: Config): Unit = {
    val s = batch.sparkSession
    graft.functions.GraftFunctions.register(s) // Cols.fastDot's float_dot
    recoverCompaction(s, cfg) // complete an interrupted fold before reading
    if (BatchParts.committed(s, s"${cfg.root}/sigs").exists(_._1 == batchId)) return
    if (batch.isEmpty) return
    val indexed = indexDirs(s, cfg) match {
      case Seq() => batch.limit(0).select("vec_id")
      case dirs => s.read.option("basePath", s"${cfg.root}/sigs")
        .schema(SigSchema).parquet(dirs: _*).select("vec_id")
    }
    val fresh = batch.dropDuplicates("vec_id")
      .join(indexed, Seq("vec_id"), "left_anti")
    Similarity.withNorm(fresh)
      .join(Similarity.signaturesOf(fresh, planesOf(s, cfg)), "vec_id")
      .repartition(col("bucket")) // one file per bucket directory
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"${cfg.root}/sigs/batch=$batchId")
  }

  private def indexDirs(s: SparkSession, cfg: Config): Seq[String] =
    BatchParts.committed(s, s"${cfg.root}/sigs").map(_._2)

  /** The whole committed index as one partitioned relation. Completes
    * an interrupted fold first: a compaction that crashed mid-delete
    * would otherwise read as a silently smaller index.
    */
  def index(s: SparkSession, cfg: Config): DataFrame = {
    recoverCompaction(s, cfg)
    indexDirs(s, cfg)
  } match {
    case Seq() => s.createDataFrame(s.sparkContext.emptyRDD[Row], SigSchema)
    case dirs => s.read.option("basePath", s"${cfg.root}/sigs")
      .schema(SigSchema).parquet(dirs: _*)
  }

  /** Fold all committed batch dirs into the newest one — the
    * [[LivePipeline.compact]] small-files story for the vector index.
    * Simpler here: the batch dir's `_SUCCESS` IS the batch commit
    * marker (single store), so any committed dir is foldable — a
    * crashed step leaves an uncommitted dir this listing never sees,
    * and its replay overwrites only that dir. Crash-safe by the same
    * roll-forward: union staged to `.compact-<m>` (bucket-partitioned,
    * so pruning survives the fold), sources ≤ m dropped, staging
    * renamed to `batch=<m>`; [[step]] completes interrupted folds
    * before reading.
    */
  def compact(s: SparkSession, cfg: Config): Unit = {
    recoverCompaction(s, cfg)
    val parts = BatchParts.committed(s, s"${cfg.root}/sigs")
    if (parts.length > 1) {
      val m = parts.last._1
      s.read.option("basePath", s"${cfg.root}/sigs").schema(SigSchema)
        .parquet(parts.map(_._2): _*)
        .drop("batch").dropDuplicates("vec_id")
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"${cfg.root}/sigs/.compact-$m")
      rollForward(s, cfg, m)
    }
  }

  private def recoverCompaction(s: SparkSession, cfg: Config): Unit = {
    val dir = new Path(s"${cfg.root}/sigs")
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
    BatchParts.committed(s, s"${cfg.root}/sigs").filter(_._1 <= m)
      .foreach { case (_, p) => fs.delete(new Path(p), true); () }
    fs.rename(new Path(s"${cfg.root}/sigs/.compact-$m"),
      new Path(s"${cfg.root}/sigs/batch=$m"))
    ()
  }

  private def ad(a: Array[Float]) =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(a.map(x => x: Any))

  /** Bucket-pruned top-k cosine serve: the query's signature is
    * `NumPlanes` driver-side DecimalDot products against the frozen
    * planes (bit-identical with the stored signatures), optionally
    * widened to its Hamming-1 neighbors (`probes` > 1, the n8
    * multi-probe recall recovery); the corpus-side work is one
    * partition-pruned scan of the probed `bucket=` directories.
    */
  def topK(s: SparkSession, cfg: Config, q: Array[Float], k: Int,
      probes: Int = 1): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val planes = planesOf(s, cfg).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    require(planes.length == NumPlanes, s"expected $NumPlanes stored planes")
    val qb = planes.map { case (_, hv) =>
      if (graft.functions.DecimalDot.dot(ad(q), ad(hv)) >= 0) "1" else "0"
    }.mkString
    val buckets = (qb +: (0 until NumPlanes).map(i =>
      qb.updated(i, if (qb(i) == '1') '0' else '1'))).take(math.max(1, probes))
    val qn = math.sqrt(graft.functions.DecimalDot.dot(ad(q), ad(q)))
    index(s, cfg)
      .filter(col("bucket").isin(buckets: _*))
      .withColumn("cos",
        Cols.fastDot(col("embedding"), typedLit(q)) / (col("norm") * lit(qn)))
      .select("vec_id", "bucket", "cos")
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }
}
