package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the library's own optimizer rules (the value-identical native
      // kernels: NativeDotRule, NativeSumRule) — Engine.session has
      // always carried them; the harness mains must run the session the
      // library documents, or the gates measure a config no deployment
      // uses
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // 64-bucket folds stay under driver-side listing (Engine.session
      // carries the rationale)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
      // keep small batches' pushed In(key) filters as real or-chains at
      // parquet (beyond the threshold Spark collapses In to a min/max
      // range — useless against uniform hash keys); the probes cap
      // their key pushdown at this value, so the two stay in step
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1024")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (comma-separated name list); the driver
    // never sets it, so the gate always runs the full inventory.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // a FAILED query must leave no dump behind: write-overwrite only
    // clears the previous run's parquet once the plan actually runs,
    // so an analysis/action-time exception would otherwise leave stale
    // results in a reused outDir for the DuckDB compare to "pass" on —
    // a correctness regression invisible to the gate
    def wipe(name: String): Unit = {
      val p = Paths.get(s"$outDir/$name")
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        wipe(name) // also clears a partial dir from a mid-write crash
      }
    }
    // JSON string escape through the shared spelling ([[Jsons.escape]])
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + Jsons.escape(s) + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
