package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Crash-point enumeration for the shared `batch=` store machinery
  * ([[BatchParts]]) that every live store (LivePipeline, LiveVectors,
  * LiveCounts/LiveNb, LiveIndex) builds on. The per-store specs prove
  * end-to-end behavior at a few crash points; this spec walks EVERY
  * boundary of the fold and rewrite protocols on a minimal store and
  * pins the two invariants the stores rely on:
  *
  *  1. READER COMPLETENESS — at any crash point, the non-mutating
  *     reader view (committed partitions, with a committed fold
  *     staging substituted for the partitions ≤ its id, and a
  *     committed rewrite staging substituted for its missing source)
  *     sees exactly the store's rows, no loss, no duplication;
  *  2. WRITER CONVERGENCE — recovery plus a re-run of the interrupted
  *     maintenance converges to the same final layout as an
  *     uninterrupted run.
  */
class BatchPartsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A store of 3 committed partitions holding rows 0..8 (3 each). */
  private def mkStore(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bp").toString + "/store"
    for (b <- 0 to 2)
      (b * 3 until b * 3 + 3).map(_.toLong).toDF("v")
        .write.parquet(s"$dir/batch=$b")
    dir
  }

  /** The reader view with both substitution rules applied. */
  private def readerRows(dir: String): Seq[Long] = {
    val parts = BatchParts.committed(spark, dir)
    val fold = BatchParts.pendingFold(spark, dir)
    val liveIds = parts.map(_._1).toSet
    val sources = fold match {
      case Some((m, staging)) => staging +: parts.filter(_._1 > m).map(_._2)
      case None => parts.map(_._2)
    }
    val rewrites = BatchParts.pendingRewrites(spark, dir)
      .filter { case (id, _) => !liveIds(id) && fold.forall(_._1 < id) }
      .map(_._2)
    (sources ++ rewrites).flatMap(p =>
      spark.read.schema("v LONG").parquet(p).collect().map(_.getLong(0)))
  }

  private def foldTo(dir: String, m: Long): Unit =
    spark.read.schema("v LONG").parquet(
        BatchParts.committed(spark, dir).filter(_._1 <= m).map(_._2): _*)
      .write.mode("overwrite").parquet(BatchParts.stagingPath(dir, m))

  test("fold: reader completeness and writer convergence at every crash boundary") {
    val allRows = (0L to 8L)
    // boundary 0: staging written but NOT committed (no _SUCCESS)
    locally {
      val dir = mkStore()
      foldTo(dir, 2L)
      assert(fs(dir).delete(new Path(s"$dir/.compact-2/_SUCCESS"), false))
      assert(readerRows(dir).sorted === allRows, "incomplete staging must be ignored")
      BatchParts.recoverFold(spark, dir)
      assert(!fs(dir).exists(new Path(s"$dir/.compact-2")), "incomplete staging discarded")
      assert(readerRows(dir).sorted === allRows)
    }
    // boundary 1: staging committed, no source deletes yet
    // boundary 2: staging committed, sources partially deleted
    // boundary 3: all sources deleted, rename pending
    for (deletes <- 0 to 3) {
      val dir = mkStore()
      foldTo(dir, 2L)
      (0 until deletes).foreach(b =>
        assert(fs(dir).delete(new Path(s"$dir/batch=$b"), true)))
      assert(readerRows(dir).sorted === allRows,
        s"reader must see the full store with $deletes sources deleted")
      BatchParts.recoverFold(spark, dir)
      assert(readerRows(dir).sorted === allRows)
      val names = fs(dir).listStatus(new Path(dir)).map(_.getPath.getName).toSet
      assert(names === Set("batch=2"),
        s"recovery must converge to the folded layout, got $names")
    }
  }

  test("rewrite: reader substitution only for a missing source; recovery converges") {
    val survivors = Seq(0L, 2L, 3L, 4L, 5L, 6L, 7L, 8L) // row 1 rewritten away
    // boundary 0: rewrite staged but NOT committed — never read, discarded
    locally {
      val dir = mkStore()
      spark.read.schema("v LONG").parquet(s"$dir/batch=0").filter(col("v") =!= 1L)
        .write.parquet(BatchParts.rewritePath(dir, 0L))
      assert(fs(dir).delete(new Path(s"$dir/.rewrite-0/_SUCCESS"), false))
      assert(readerRows(dir).sorted === (0L to 8L), "incomplete rewrite ignored")
      BatchParts.recoverRewrites(spark, dir)
      assert(!fs(dir).exists(new Path(s"$dir/.rewrite-0")))
      assert(readerRows(dir).sorted === (0L to 8L))
    }
    // boundary 1: committed staging, source still present — the source
    // wins (the rewritten-away rows are still masked upstream by the
    // tombstones that motivated the rewrite, so no duplication and no
    // premature removal at this layer)
    // boundary 2: committed staging, source deleted, rename pending —
    // the staging substitutes
    for (deleteSource <- Seq(false, true)) {
      val dir = mkStore()
      spark.read.schema("v LONG").parquet(s"$dir/batch=0").filter(col("v") =!= 1L)
        .write.parquet(BatchParts.rewritePath(dir, 0L))
      if (deleteSource) assert(fs(dir).delete(new Path(s"$dir/batch=0"), true))
      val expect = if (deleteSource) survivors else (0L to 8L)
      assert(readerRows(dir).sorted === expect,
        s"reader view with deleteSource=$deleteSource")
      BatchParts.recoverRewrites(spark, dir)
      assert(readerRows(dir).sorted === survivors,
        "recovery completes the rewrite either way")
      val names = fs(dir).listStatus(new Path(dir)).map(_.getPath.getName).toSet
      assert(names === Set("batch=0", "batch=1", "batch=2"))
    }
  }

  test("fold and rewrite ids never collide: recovery handles both pending at once") {
    val dir = mkStore()
    // a rewrite of batch=0 staged+committed AND a fold of everything
    // staged+committed, both interrupted before their renames — the
    // single maintenance owner can crash between vacuum and compact
    spark.read.schema("v LONG").parquet(s"$dir/batch=0").filter(col("v") =!= 1L)
      .write.parquet(BatchParts.rewritePath(dir, 0L))
    BatchParts.recoverRewrites(spark, dir) // rewrite completes first
    foldTo(dir, 2L)
    assert(fs(dir).delete(new Path(s"$dir/batch=0"), true))
    assert(readerRows(dir).sorted === (0L to 8L).filter(_ != 1L),
      "reader through the fold staging after the rewrite")
    BatchParts.recoverFold(spark, dir)
    val names = fs(dir).listStatus(new Path(dir)).map(_.getPath.getName).toSet
    assert(names === Set("batch=2"))
    assert(readerRows(dir).sorted === (0L to 8L).filter(_ != 1L))
  }
}
