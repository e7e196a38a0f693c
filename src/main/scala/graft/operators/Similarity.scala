package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Cols, Tables}

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two tiers (SURVEY.md §7.5):
  *  - brute force: broadcast the query vector, score every row with a
  *    decimal-exact cosine, TakeOrderedAndProject top-k. At 100 TB this is
  *    one full scan with no shuffle — the right baseline, and still the
  *    right answer for one-off queries;
  *  - LSH (random-hyperplane signs): each vector gets an 8-bit bucket
  *    signature; only the query's bucket is scanned. The hyperplane set is
  *    a tiny broadcast dim; the bucket assignment is a broadcast-join +
  *    groupBy, so buckets can be written out partitioned by signature and
  *    pruned at read time — the scan shrinks by ~2^bits.
  *
  * Hyperplanes are taken from the dataset itself (vec_id 1..8) so both
  * engines derive identical buckets without a cross-engine random source.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private val NumPlanes = 8

  /** 8-bit sign-signature per vector from broadcast hyperplanes. */
  private def signatures(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val hp = e.filter(col("vec_id").between(1, NumPlanes))
      .select(col("vec_id").as("hid"), col("embedding").as("hv"))
    val bitCols = (1 to NumPlanes).map(h => max(when(col("hid") === h, col("bit"))))
    e.crossJoin(broadcast(hp))
      .select(col("vec_id"), col("hid"),
        when(Cols.fastDot(col("embedding"), col("hv")) >= 0, lit("1"))
          .otherwise(lit("0")).as("bit"))
      .groupBy("vec_id")
      .agg(concat(bitCols: _*).as("bucket"))
  }

  private def withNorm(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    e.withColumn("norm", sqrt(Cols.fastDot(col("embedding"), col("embedding"))))

  def queries: Map[String, Q] = Map(
    // Brute-force exact top-10 by cosine against the vec_id=0 query
    // vector: one scan, broadcast query row, TakeOrderedAndProject.
    "n1_ann_bruteforce" -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val e = withNorm(Tables.embeddings(s, d))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("norm").as("qn"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .withColumn("cos", Cols.fastDot(col("embedding"), col("qv")) / (col("norm") * col("qn")))
        .select("vec_id", "label", "cos")
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    },
    // LSH-bucketed ANN: restrict scoring to the query's sign-bucket.
    "n2_ann_lsh" -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val e = withNorm(Tables.embeddings(s, d))
      val sig = signatures(s, d)
      val qb = sig.filter(col("vec_id") === 0).select(col("bucket").as("qbucket"))
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("norm").as("qn"))
      e.join(sig, "vec_id")
        .crossJoin(broadcast(qb))
        .filter(col("bucket") === col("qbucket") && col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cos", Cols.fastDot(col("embedding"), col("qv")) / (col("norm") * col("qn")))
        .select("vec_id", "bucket", "cos")
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    }
  )

  def oracles: Map[String, String] = Map(
    "n1_ann_bruteforce" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${Cols.cosineSql("embedding", "qv")} AS cos
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "n2_ann_lsh" ->
      s"""WITH hp AS (SELECT vec_id AS hid, embedding AS hv FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND $NumPlanes),
         |bits AS (SELECT e.vec_id, hid,
         |    CASE WHEN ${Cols.dotDecSql("e.embedding", "hv")} >= 0 THEN '1' ELSE '0' END AS bit
         |  FROM embeddings e, hp),
         |sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY hid) AS bucket
         |  FROM bits GROUP BY vec_id),
         |q AS (SELECT s.bucket AS qbucket, e.embedding AS qv
         |  FROM sig s JOIN embeddings e USING (vec_id) WHERE vec_id = 0)
         |SELECT e.vec_id, s.bucket, ${Cols.cosineSql("e.embedding", "qv")} AS cos
         |FROM embeddings e JOIN sig s USING (vec_id), q
         |WHERE s.bucket = q.qbucket AND e.vec_id <> 0
         |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin
  )
}
