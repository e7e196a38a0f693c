package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool (guide §1): runs the named
  * queries once warm under the bench's exact session config and prints a
  * per-Spark-job wall-time breakdown with call sites, so time inside a
  * multi-action query (store builds, planning collects, commit writes)
  * can be attributed to the line that spent it — the Spark-UI stage view
  * for a UI-less session. Measurement only; never run by the driver.
  */
object Profile {
  private final case class JobRec(id: Int, site: String, var t0: Long = 0L,
      var t1: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    Tables.events(spark, sfDir).count()
    graft.operators.Dedup.ensureStores(spark, sfDir)
    graft.operators.Similarity.ensureStores(spark, sfDir)
    graft.operators.Ivf.ensureStores(spark, sfDir)
    graft.operators.Pq.ensureStores(spark, sfDir)
    graft.operators.Bpe.ensureTrained(spark, sfDir)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val r = JobRec(e.jobId, site); r.t0 = e.time
        jobs.put(e.jobId, r); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
      }
    }

    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // warm run: JIT, codegen, footer caches — profile the steady state
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the async listener bus drain before reading (the bus is
      // private API; a settle sleep is enough for a measurement tool)
      Thread.sleep(800)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.id)
      val byJob = recs.map(r => (r.id, r.site, (r.t1 - r.t0) / 1e3))
      val jobSum = byJob.map(_._3).sum
      println(f"\n===== $name wall=$wall%.3f s, jobs=${recs.size}, jobSum=$jobSum%.3f s (gaps=${wall - jobSum}%.3f) =====")
      byJob.foreach { case (id, site, sec) => println(f"  job $id%3d  $sec%7.3f s  $site") }
      val bySite = byJob.groupBy(_._2).view
        .mapValues(g => (g.size, g.map(_._3).sum)).toSeq.sortBy(-_._2._2)
      println("  -- by call site --")
      bySite.foreach { case (site, (n, sec)) => println(f"  $sec%7.3f s  n=$n%-3d $site") }
    }
    spark.stop()
  }
}
