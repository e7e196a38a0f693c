package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval-quality floor for the ANN tiers: recall@10 against the n1
  * exact scan on a corpus WITH geometric cluster structure.
  *
  * The driver's synthetic `embeddings` table is uniform-random (measured:
  * intra-label mean cosine 0.004 vs inter-label −0.002), so labels are
  * not geometric cells there and pruned recall is necessarily low — a
  * data property, not an operator property. This fixture builds 10 true
  * clusters (unit-ish prototypes + small noise, labels interleaved so
  * the n2 hyperplane rows 1..8 span 8 different clusters) and pins the
  * recall each tier is designed to deliver on clusterable data.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Dims = 64
  private val NumClusters = 10
  private val NumVecs = 500

  private lazy val fixtureDir: String = {
    val out = Files.createTempDirectory("graft-ann-recall").toString
    val rnd = new scala.util.Random(42)
    val protos = Array.fill(NumClusters)(Array.fill(Dims)(rnd.nextGaussian().toFloat))
    val rows = (0 until NumVecs).map { i =>
      val k = i % NumClusters // interleaved: vec 0 = query in cluster 0
      val emb = protos(k).map(v => v + 0.15f * rnd.nextGaussian().toFloat)
      Row(i.toLong, emb.toSeq, k)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  private def top10(name: String): Set[Long] =
    SparkEntry.queries(name)(spark, fixtureDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet

  test("cell/code-pruned ANN tiers recover the exact top-10 on clustered data") {
    val exact = top10("n1_ann_bruteforce")
    assert(exact.size === 10)
    def recall(name: String): Double = (exact & top10(name)).size / 10.0

    // n4/n6: the query's own cluster is its nearest cell and holds all
    // its true neighbors; nprobe=2 must recover (nearly) everything.
    assert(recall("n4_ann_ivf") >= 0.9, s"n4 recall ${recall("n4_ann_ivf")}")
    assert(recall("n6_ann_kmeans") >= 0.9, s"n6 recall ${recall("n6_ann_kmeans")}")
    // n7: ADC shortlist + exact-cosine refine. Same-cell vectors share
    // all M codes and tie in ADC (quantization collapses within-cell
    // distinctions), so the shortlist admits the whole query cell and
    // the refine stage restores the exact ranking — without the refine
    // stage, recall here measured 0.2.
    assert(recall("n7_ann_pq") >= 0.9, s"n7 recall ${recall("n7_ann_pq")}")
    // n2: 8 hyperplanes cut even the query's own cluster into buckets,
    // and a SINGLE-bucket probe keeps only same-signature neighbors —
    // that is the deliberate trade: ~2^8 scan selectivity for partial
    // recall (measured 0.2 here). The standard recall lever is
    // multi-probe (also scan the buckets at Hamming distance 1, i.e.
    // flip the weakest sign bits), which multiplies probes, not state.
    assert(recall("n2_ann_lsh") >= 0.2, s"n2 recall ${recall("n2_ann_lsh")}")
    // n8 probes the query bucket + its 8 Hamming-1 neighbors: recall must
    // strictly improve on the single probe at 9× the pruned scan.
    assert(recall("n8_ann_multiprobe") > recall("n2_ann_lsh"),
      s"n8 ${recall("n8_ann_multiprobe")} vs n2 ${recall("n2_ann_lsh")}")
    assert(recall("n8_ann_multiprobe") >= 0.5, s"n8 recall ${recall("n8_ann_multiprobe")}")
  }
}
