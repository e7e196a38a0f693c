package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
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
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
