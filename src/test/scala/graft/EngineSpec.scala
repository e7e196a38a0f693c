package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Engine facade's training-data-pipeline surface with NON-default
  * parameters — proves the operators are a parameterized library API, not
  * gate-constant one-offs.
  */
class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("packSequences honors blockSize and shard count") {
    val rows = Engine.packSequences(
      Tables.documents(spark, d).select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens")),
      blockSize = 16, shards = 2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (shard, cum, chunk, off) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(shard >= 0 && shard < 2)
      assert(chunk === cum / 16 && off === cum % 16)
    }
    assert(rows.map(_.getLong(3)).distinct.length === 2, "both shards used")
  }

  test("bm25 accepts arbitrary query terms and k1/b") {
    val docs = Tables.documents(spark, d)
    val top = Engine.bm25(docs, Seq("vector", "stream"), n = 5).collect()
    assert(top.length === 5 && top.forall(_.getDouble(1) > 0))
    // b = 0 disables length normalization: score depends on tf only, so a
    // doc with equal tf but shorter length no longer outranks
    val noNorm = Engine.bm25(docs, Seq("vector", "stream"), n = 5, b = 0.0).collect()
    assert(noNorm.length === 5)
    assert(!top.map(_.getLong(0)).sameElements(noNorm.map(_.getLong(0))) ||
      top.map(_.getDouble(1)).zip(noNorm.map(_.getDouble(1))).exists {
        case (a, bb) => math.abs(a - bb) > 1e-9
      }, "b=0 changed nothing — length normalization not wired")
  }

  test("kAnonymize floors any quasi-identifier set at any k") {
    val ev = Tables.events(spark, d)
      .withColumn("day", date_trunc("day", col("ts")))
    val k5 = Engine.kAnonymize(ev, Seq("event_type", "day"), k = 5).collect()
    assert(k5.nonEmpty)
    val sizes = k5.groupBy(r =>
      (r.getAs[String]("event_type"), r.getAs[java.sql.Timestamp]("day")))
    sizes.foreach { case (g, rs) =>
      assert(rs.length >= 5, s"group $g under k")
      rs.foreach(r => assert(r.getAs[Long]("group_n") === rs.length.toLong))
    }
  }

  test("substringDupStats honors gram width") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-eng-d10").toString
    // docs share a 3-word span only: 3-grams catch it, 6-grams must not
    Seq((1L, "red green blue cyan magenta yellow black"),
        (2L, "one two red green blue nine ten eleven"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val g3 = Engine.substringDupStats(docs, gramWords = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val g6 = Engine.substringDupStats(docs, gramWords = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g3(1L) === 1L && g3(2L) === 1L, s"3-gram should find the shared span: $g3")
    assert(g6(1L) === 0L && g6(2L) === 0L, s"6-gram must not: $g6")
  }
}
