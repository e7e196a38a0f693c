package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Cols, Tables}

/** IVF-style ANN (SURVEY.md §7.5 scale path): a coarse quantizer assigns
  * every vector to a cell; queries probe only their nearest cell.
  *
  * The coarse centroids here are the per-label per-dimension decimal-exact
  * means (deterministic in both engines — no iterative k-means, whose
  * float order-dependence would break the oracle); at 100 TB the cell id
  * would be a real trained quantizer, the dataflow is identical:
  * centroid table (tiny, broadcast) → cell assignment → `partitionBy(cell)`
  * storage → per-query single-cell scan + exact re-rank.
  */
object Ivf {
  type Q = (SparkSession, String) => DataFrame

  private val Dec12 = DecimalType(28, 12)

  /** Cells probed per query — the standard IVF recall/latency lever:
    * scanning the nprobe nearest cells instead of one recovers neighbors
    * that fell just across a cell boundary at nprobe× the scan cost.
    */
  private val NProbe = 2

  def queries: Map[String, Q] = Map(
    "n4_ann_ivf" -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
      // exploded view: (label, vec_id, dim, v)
      val ex = e.select(col("label"), col("vec_id"), posexplode(col("embedding")))
        .withColumnRenamed("pos", "dim")
        .withColumnRenamed("col", "v")
      // per-cell centroids: decimal-exact per-dimension means
      val cent = ex.groupBy("label", "dim")
        .agg((sum(col("v").cast("double").cast(Dec12)).cast("double") /
          count(lit(1)).cast("double")).as("c"))
      // squared distance of the query vector to every centroid
      val qx = ex.filter(col("vec_id") === 0).select(col("dim"), col("v").cast("double").as("qv"))
      val dist = cent.join(qx, "dim")
        .groupBy("label")
        .agg(sum(((col("qv") - col("c")) * (col("qv") - col("c"))).cast(Dec12))
          .cast("double").as("d2"))
      val bestCell = dist.orderBy(col("d2"), col("label")).limit(NProbe).select("label")
      // probe only the chosen cells; exact cosine re-rank
      val en = e.withColumn("norm", sqrt(Cols.fastDot(col("embedding"), col("embedding"))))
      val qv = en.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), col("norm").as("qn"))
      en.join(broadcast(bestCell), "label")
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .withColumn("cos", Cols.fastDot(col("embedding"), col("qv")) / (col("norm") * col("qn")))
        .select("vec_id", "label", "cos")
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
    }
  )

  def oracles: Map[String, String] = Map(
    "n4_ann_ivf" ->
      s"""WITH ex AS (
         |  SELECT label, vec_id, generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS v
         |  FROM embeddings),
         |cent AS (
         |  SELECT label, dim,
         |    CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
         |      / CAST(COUNT(*) AS DOUBLE) AS c
         |  FROM ex GROUP BY label, dim),
         |qx AS (SELECT dim, CAST(v AS DOUBLE) AS qv FROM ex WHERE vec_id = 0),
         |dist AS (
         |  SELECT label,
         |    CAST(SUM(CAST((qv - c) * (qv - c) AS DECIMAL(28,12))) AS DOUBLE) AS d2
         |  FROM cent JOIN qx USING (dim) GROUP BY label),
         |best AS (SELECT label FROM dist ORDER BY d2, label LIMIT $NProbe),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, e.label, ${Cols.cosineSql("e.embedding", "qv")} AS cos
         |FROM embeddings e JOIN best USING (label), q
         |WHERE e.vec_id <> 0
         |ORDER BY cos DESC, e.vec_id LIMIT 10""".stripMargin
  )
}
