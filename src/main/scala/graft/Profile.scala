package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionStart => SqlStart}

/** Optimization-round measurement tool (guide §1): runs the named
  * queries once warm under the bench's exact session config and prints
  * wall time per SQL EXECUTION (action) with its call site and job
  * count, so time inside a multi-action query (store builds, planning
  * collects, commit writes) can be attributed to the line that spent it
  * — the Spark-UI SQL tab for a UI-less session. Under AQE every
  * exchange materializes as its own job, so per-job call sites are
  * opaque; per-execution is the actionable granularity. Measurement
  * only; never run by the driver.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .config("spark.sql.limit.initialNumPartitions",
        sys.env.getOrElse("SPARK_GRAFT_LIMIT_PARTS", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    Tables.events(spark, sfDir).count()
    graft.operators.Dedup.ensureStores(spark, sfDir)
    graft.operators.Similarity.ensureStores(spark, sfDir)
    graft.operators.Ivf.ensureStores(spark, sfDir)
    graft.operators.Pq.ensureStores(spark, sfDir)
    graft.operators.Bpe.ensureTrained(spark, sfDir)

    // executionId → (description, first job start ms, last job end ms, jobs)
    final class ExecRec(val desc: String) {
      @volatile var t0 = Long.MaxValue
      @volatile var t1 = Long.MinValue
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    }
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, ExecRec]()
    val listener = new SparkListener {
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: SqlStart =>
          // only root executions (AQE re-plans nest under the root id)
          execs.putIfAbsent(s.executionId, new ExecRec(s.description)); ()
        case _ => ()
      }
      private def execOf(p: java.util.Properties): Option[ExecRec] =
        Option(p).flatMap(q => Option(q.getProperty("spark.sql.execution.root.id"))
          .orElse(Option(q.getProperty("spark.sql.execution.id"))))
          .flatMap(id => Option(execs.get(id.toLong)))
      private val jobExec = new java.util.concurrent.ConcurrentHashMap[Int, ExecRec]()
      override def onJobStart(e: SparkListenerJobStart): Unit =
        execOf(e.properties).foreach { r =>
          jobExec.put(e.jobId, r)
          r.jobs.incrementAndGet()
          r.t0 = math.min(r.t0, e.time); r.t1 = math.max(r.t1, e.time)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobExec.get(e.jobId)).foreach(r => r.t1 = math.max(r.t1, e.time))
    }

    // ad-hoc experiment frames ("exp:<tag>"): cost-attribution probes
    // for spelling alternatives, never part of the inventory
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    def experiment(tag: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
      tag match {
        case "md5buckets" => (s, d) => { // the x25 feature-bucket map stage alone
          val base = Tables.documents(s, d).select(col("doc_id"),
            split(col("text"), " ").as("a"))
          base.select(col("doc_id"), explode(concat(
              col("a"),
              when(size(col("a")) >= 2, expr(
                "transform(sequence(1, size(a) - 1), " +
                  "i -> concat(element_at(a, i), '_', element_at(a, i + 1)))"))
                .otherwise(array()))).as("feat"))
            .select((conv(substring(md5(concat(lit("dsir|"), col("feat"))), 1, 2), 16, 10)
              .cast("long") % 256).as("bucket"))
        }
        case "a10dec" => (s, d) => { // the a10 aggregate as shipped
          val q = col("l_quantity"); val p = col("l_extendedprice")
          Tables.lineitem(s, d).groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"), Cols.dsum(q).as("sum_q"), Cols.dsum(p).as("sum_p"),
              Cols.dsum(q * q).as("sum_qq"), Cols.dsum(p * p).as("sum_pp"),
              Cols.dsum(q * p).as("sum_qp"))
        }
        case "a10dbl" => (s, d) => { // same with double sums (inexact)
          val q = col("l_quantity").cast("double"); val p = col("l_extendedprice").cast("double")
          Tables.lineitem(s, d).groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"), sum(q).as("sum_q"), sum(p).as("sum_p"),
              sum(q * q).as("sum_qq"), sum(p * p).as("sum_pp"), sum(q * p).as("sum_qp"))
        }
        case "a10one" => (s, d) => { // ONE decimal sum, rest dropped
          val q = col("l_quantity")
          Tables.lineitem(s, d).groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"), Cols.dsum(q).as("sum_q"))
        }
        case "a10n" => (s, d) => // no sums at all: scan + count only
          Tables.lineitem(s, d).groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        case "a10d18" => (s, d) => { // decimal(18,6) inputs (compact reps)
          val dec = DecimalType(18, 6)
          val q = col("l_quantity").cast(dec); val p = col("l_extendedprice").cast(dec)
          Tables.lineitem(s, d).groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"),
              sum(q).cast("double").as("sum_q"), sum(p).cast("double").as("sum_p"),
              sum(q * q).cast("double").as("sum_qq"),
              sum(p * p).cast("double").as("sum_pp"),
              sum(q * p).cast("double").as("sum_qp"))
        }
        case "a10ul" => (s, d) => { // cast to decimal kept, ADD in long
          import org.apache.spark.sql.catalyst.expressions.{Cast, UnscaledValue}
          s.sessionState.functionRegistry.createOrReplaceTempFunction(
            "ul6", exprs => UnscaledValue(Cast(exprs.head, Cols.Dec)), "built-in")
          def ul(c: org.apache.spark.sql.Column) = call_function("ul6", c)
          val q = col("l_quantity"); val p = col("l_extendedprice")
          Tables.lineitem(s, d).groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"), sum(ul(q)).as("sum_q"), sum(ul(p)).as("sum_p"),
              sum(ul(q * q)).as("sum_qq"), sum(ul(q)).as("sum_pp"),
              sum(ul(q * p)).as("sum_qp"))
        }
        case "a10dec5" => (s, d) => { // dec spelling minus the pp column
          val q = col("l_quantity"); val p = col("l_extendedprice")
          Tables.lineitem(s, d).groupBy("l_returnflag")
            .agg(count(lit(1)).as("n"), Cols.dsum(q).as("sum_q"), Cols.dsum(p).as("sum_p"),
              Cols.dsum(q * q).as("sum_qq"), Cols.dsum(q).as("sum_pp"),
              Cols.dsum(q * p).as("sum_qp"))
        }
        case other => sys.error(s"unknown experiment: $other")
      }
    for (name <- args) {
      val fn = if (name.startsWith("exp:")) experiment(name.stripPrefix("exp:"))
        else SparkEntry.queries(name)
      // warm run: JIT, codegen, footer caches — profile the steady state
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // three timed runs for a median wall; exec detail from the last
      val walls = (1 to 3).map { _ =>
        execs.clear()
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800) // async listener bus settle
        spark.sparkContext.removeSparkListener(listener)
        w
      }
      val wall = walls.sorted.apply(1)
      import scala.jdk.CollectionConverters._
      val recs = execs.asScala.toSeq.sortBy(_._1)
      val totJobs = recs.map(_._2.jobs.get).sum
      println(f"\n===== $name wall=$wall%.3f s (runs ${walls.map(w => f"$w%.3f").mkString("/")}), execs=${recs.size}, jobs=$totJobs =====")
      recs.foreach { case (id, r) =>
        val sec = if (r.t1 >= r.t0) (r.t1 - r.t0) / 1e3 else 0.0
        println(f"  exec $id%4d  $sec%7.3f s  jobs=${r.jobs.get}%-3d ${r.desc.take(90)}")
      }
      // executed-plan node census of the final frame: how many scans /
      // exchanges actually ran vs were reused (AQE hides reuse from the
      // static plan)
      if (sys.env.get("SPARK_GRAFT_PROFILE_PLAN").contains("1")) {
        // capture the POST-execution adaptive plan (reused stages are
        // only visible there) via a QueryExecutionListener
        val qes = new java.util.concurrent.ConcurrentLinkedQueue[
          org.apache.spark.sql.execution.QueryExecution]()
        val ql = new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              d: Long): Unit = { qes.add(qe); () }
          override def onFailure(fn: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              e: Exception): Unit = ()
        }
        spark.listenerManager.register(ql)
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Thread.sleep(1000)
          import org.apache.spark.sql.execution.SparkPlan
          import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
          def walk(p: SparkPlan): Seq[String] = (p match {
            case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
            case q: QueryStageExec => q.nodeName +: walk(q.plan)
            case other => other.nodeName +: (other.children ++ other.subqueries).flatMap(walk)
          })
          import scala.jdk.CollectionConverters._
          qes.asScala.lastOption.foreach { qe =>
            val census = walk(qe.executedPlan)
              .groupBy(identity).view.mapValues(_.size).toSeq.sortBy(-_._2)
            println("  -- executed plan node census (final adaptive) --")
            census.foreach { case (n, c) => println(f"  $c%4d  $n") }
          }
        } finally spark.listenerManager.unregister(ql)
      }
    }
    spark.stop()
  }
}
