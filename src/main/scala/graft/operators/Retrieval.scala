package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Sparse (BM25) keyword retrieval and hybrid sparse+dense fusion — the
  * retrieval side of a training-data/RAG pipeline, complementing the
  * dense-only ANN family (n1..n9).
  *
  * Scale shapes:
  *  - BM25 index stats (dl, tf, df, avgdl) are the ingest-time
  *    materialization at 100 TB (an inverted index keyed by term); here
  *    they are derived inline from one explode + map-side-combinable aggs,
  *    a vocabulary-sized df dim, and one term-keyed join — x7's audited
  *    plan with a different scoring formula.
  *  - Fusion joins two bounded top-k lists (tiny by construction): both
  *    rankings arrive via TakeOrderedAndProject, the rank windows run over
  *    ≤ k rows, and the full-outer fuse join is a broadcast of 20-row sides.
  *
  * Cross-engine determinism: every division/multiplication chain is spelled
  * identically on both engines over exact integer inputs (correctly-rounded
  * IEEE ops ⇒ bit-identical); the one libm call (ln in idf) is rounded to
  * 9 digits on both sides, and per-term scores are rounded before the
  * order-independent decimal sum (the x10 pattern).
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed keyword query (terms from the corpus vocabulary). */
  val QueryTerms: Seq[String] = Seq("spark", "merge", "window")

  /** Okapi defaults — shared with [[graft.streaming.LiveIndex]] so the
    * batch and live serving paths cannot silently diverge on
    * parameters.
    */
  private[graft] val K1 = 1.2
  private[graft] val B  = 0.75

  /** Public BM25 operator: top-`n` docs from `docs` (needs `doc_id`,
    * `text`) for keyword query `terms`, with Okapi parameters `k1`/`b`.
    * Columns: `doc_id`, `bm25`, `n_terms_hit`. Per-term contributions are
    * 9-digit-rounded and decimal-summed (order-independent, cross-engine
    * deterministic — see the object scaladoc).
    */
  def bm25(docs: DataFrame, terms: Seq[String], n: Int,
      k1: Double = K1, b: Double = B): DataFrame =
    bm25Scores(docs, terms, k1, b)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(n)

  /** Un-truncated per-document BM25 scores (the index-stats + scoring
    * stages of [[bm25]] without the final top-`n`), for callers that
    * filter or re-rank before truncating — e.g. n10's text leg, which
    * drops the query document itself before taking its top 20.
    */
  def bm25Scores(docs: DataFrame, terms: Seq[String],
      k1: Double = K1, b: Double = B): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("word").isin(terms: _*))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    bm25FromIndex(tf, dl, k1, b)
  }

  /** The scoring stage of [[bm25Scores]] over PREPARED index frames —
    * `tf(doc_id, word, tf)` restricted to the query terms and
    * `dl(doc_id, dl)` for every indexed doc. Shared verbatim by the
    * inline spelling above and the continuously-maintained store
    * ([[graft.streaming.LiveIndex]]), so the two cannot diverge: df,
    * the corpus stats, and every rounding spelling are derived HERE
    * from whichever frames arrive. Exact integer inputs ⇒ bit-identical
    * scores whether the frames were computed inline or read back from
    * per-batch parquet commits.
    */
  def bm25FromIndex(tf: DataFrame, dl: DataFrame,
      k1: Double = K1, b: Double = B): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("total_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", round(log(
        lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))), 9))
      .withColumn("w", round(
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))), 9))
      .groupBy("doc_id")
      .agg(sum(col("w").cast(DecimalType(28, 12))).cast("double").as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** Gate spelling: BM25 over the sf corpus with the fixed query. */
  private def bm25TopN(s: SparkSession, d: String, n: Int): DataFrame =
    bm25(Tables.documents(s, d), QueryTerms, n)

  /** Oracle CTEs shared by x14 and n10 (everything through per-doc BM25). */
  private def bm25Ctes: String = {
    val termVals = QueryTerms.map(t => s"('$t')").mkString(", ")
    s"""qt(term) AS (VALUES $termVals),
       |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |tk AS (SELECT doc_id, word FROM toks WHERE length(word) > 0),
       |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tk GROUP BY doc_id),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl),
       |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
       |  FROM tk JOIN qt ON word = term GROUP BY doc_id, word),
       |dfreq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word),
       |sc AS (SELECT doc_id, word, tf, df, dl,
       |    CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl,
       |    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
       |      (CAST(df AS DOUBLE) + 0.5)), 9) AS idf
       |  FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id), stats),
       |ws AS (SELECT doc_id, word, tf, df,
       |    round(idf * (CAST(tf AS DOUBLE) * ${K1 + 1.0}) /
       |      (CAST(tf AS DOUBLE) + $K1 * (${1.0 - B} + $B * CAST(dl AS DOUBLE) / avgdl)), 9) AS w
       |  FROM sc),
       |agg AS (SELECT doc_id,
       |    CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS bm25,
       |    CAST(count(*) AS BIGINT) AS n_terms_hit
       |  FROM ws GROUP BY doc_id)""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    // BM25 (k1=1.2, b=0.75) for a fixed keyword query; top-15 docs.
    "x14_bm25" -> { (s, d) =>
      bm25TopN(s, d, 15).select("doc_id", "bm25", "n_terms_hit")
    },
    // Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25 top-20
    // and the dense cosine top-20 against doc/vec 0's embedding
    // (documents.doc_id ≡ embeddings.vec_id in this corpus). The dense
    // leg serves from the materialized LSH signature store via the n8
    // multi-probe path — a bucket-pruned scan of 9 `bucket=` directories,
    // NOT a full corpus scan: serving hybrid retrieval at scale is
    // exactly when the index must pay off. Both legs drop the query's own
    // document (vec_id/doc_id 0) so the two rankings are symmetric. Each
    // side is a bounded TakeOrderedAndProject; the rank windows and the
    // full-outer fuse join run over ≤ 20 rows. 1/(60+rank) is a
    // correctly-rounded double of exact integers and the two
    // contributions are added in a fixed spelled order, so the fused
    // score is bit-identical cross-engine without decimal routing.
    "n10_hybrid_rrf" -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val rrfK = 60
      val denseTop = Similarity.multiProbeScores(s, d)
        .select("vec_id", "cos")
        .orderBy(col("cos").desc, col("vec_id")).limit(20)
      val dense = denseTop.withColumn("vrank",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      val text = bm25Scores(Tables.documents(s, d), QueryTerms)
        .filter(col("doc_id") =!= 0)
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
        .withColumn("trank",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long"))
      dense.select(col("vec_id").as("id"), col("vrank"))
        .join(text.select(col("doc_id").as("id"), col("trank")), Seq("id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("vrank").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK).cast("double") + col("trank").cast("double")), lit(0.0)))
        .select("id", "vrank", "trank", "rrf")
        .orderBy(col("rrf").desc, col("id"))
        .limit(10)
    },
    // MMR diversity re-rank (Carbonell & Goldstein 1998): greedily pick
    // K results maximizing λ·relevance − (1−λ)·max-similarity-to-picked,
    // so near-duplicate hits don't crowd the result list. Candidates are
    // the top-10 of the bucket-pruned multi-probe scores (the n8 serving
    // path — corpus-scale work stays indexed); the greedy selection then
    // runs DRIVER-locally over that ≤10-row collected list via the same
    // DecimalDot statics the distributed expression compiles to, so the
    // whole re-rank is zero extra Spark jobs (round 9 ran each greedy
    // round as its own crossJoin/collect job — ~20 jobs for a 10-row
    // re-rank, pure scheduling overhead at any scale). The score
    // 0.5·cos − 0.5·maxsim is fixed-spelling IEEE double in both
    // engines. At scale MMR cost is K·|candidates| cosine pairs — a
    // re-rank, by construction never corpus-shaped.
    "n11_mmr" -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val cand = Similarity.multiProbeScores(s, d)
        .orderBy(col("cos").desc, col("vec_id")).limit(MmrCand)
        .join(Tables.embeddings(s, d).select("vec_id", "embedding"), Seq("vec_id"))
        .select("vec_id", "cos", "embedding")
      mmrRerank(s, cand, k = MmrK, lambda = 0.5)
    }
  )

  /** MMR picks / candidate-pool size for the gate (λ fixed at 0.5). */
  private val MmrK = 5
  private val MmrCand = 10

  /** Public MMR re-rank: greedily select `k` of the `candidates`
    * (columns `vec_id`, `cos` = relevance, `embedding`) maximizing
    * `lambda·cos − (1−lambda)·max-cos-to-already-picked`. Collects the
    * candidate list up front — callers hand in a BOUNDED top-k list
    * (that is what a re-ranker is for) — then runs the whole greedy
    * selection driver-locally: every pairwise cosine goes through the
    * SAME [[graft.functions.DecimalDot]] static the distributed
    * expression compiles to (double products → DECIMAL(28,12) HALF_UP →
    * exact sum → double), so the numbers are bit-identical with both the
    * Spark spelling and the oracle's cosineSql, with zero per-round
    * Spark jobs. Returns (`pick` 1..k, `vec_id`, `cos`) in pick order.
    */
  def mmrRerank(s: SparkSession, candidates: DataFrame, k: Int, lambda: Double): DataFrame = {
    import s.implicits._
    val cand = candidates.select("vec_id", "cos", "embedding")
      .collect() // bounded by construction: candidates ARE a top-k list
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray))
      .sortBy { case (vid, cos, _) => (-cos, vid) }
    require(cand.nonEmpty, "mmrRerank needs a non-empty candidate list")
    def ad(a: Array[Float]) =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(a.map(x => x: Any))
    val arrs = cand.map(c => ad(c._3))
    val norms = arrs.map(a => math.sqrt(graft.functions.DecimalDot.dot(a, a)))
    // cosine spelled exactly like Cols.cosine / cosineSql: decimal dot,
    // double sqrt/division — max over doubles is order-independent
    def cosAt(i: Int, j: Int): Double =
      graft.functions.DecimalDot.dot(arrs(i), arrs(j)) / (norms(i) * norms(j))
    var picked = Vector(0) // most relevant candidate seeds the list
    while (picked.length < math.min(k, cand.length)) {
      val next = cand.indices.filterNot(picked.contains).minBy { i =>
        val maxsim = picked.map(j => cosAt(i, j)).max
        // same IEEE spelling as the oracle's 0.5*cos - 0.5*maxsim;
        // argmax of score, vec_id tie-break == ORDER BY score DESC, vec_id
        (-(lambda * cand(i)._2 - (1.0 - lambda) * maxsim), cand(i)._1)
      }
      picked :+= next
    }
    picked.zipWithIndex
      .map { case (ci, p) => ((p + 1).toLong, cand(ci)._1, cand(ci)._2) }
      .toDF("pick", "vec_id", "cos")
  }

  /** One unrolled MMR round in DuckDB: max similarity of each remaining
    * candidate to the picked set s{i-1}, then the argmax of the MMR
    * score — the same greedy step the Spark rounds run.
    */
  private def mmrRoundSql(i: Int): String =
    s"""ms$i AS (SELECT r.vec_id, MAX(${graft.Cols.cosineSql("r.embedding", "s.embedding")}) AS maxsim
       |  FROM cand r JOIN s${i - 1} s ON TRUE
       |  WHERE r.vec_id NOT IN (SELECT vec_id FROM s${i - 1})
       |  GROUP BY r.vec_id),
       |p$i AS (SELECT c.vec_id, c.cos, c.embedding, CAST($i AS BIGINT) AS pick
       |  FROM cand c JOIN ms$i m USING (vec_id)
       |  ORDER BY 0.5 * c.cos - 0.5 * m.maxsim DESC, c.vec_id LIMIT 1),
       |s$i AS (SELECT * FROM s${i - 1} UNION ALL SELECT * FROM p$i)""".stripMargin

  def oracles: Map[String, String] = Map(
    "x14_bm25" ->
      s"""WITH ${bm25Ctes}
         |SELECT doc_id, bm25, n_terms_hit FROM agg
         |ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,
    "n10_hybrid_rrf" ->
      s"""WITH ${bm25Ctes},
         |${Similarity.multiProbeCtes},
         |dtop AS (SELECT vec_id, cos,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS vrank
         |  FROM mp ORDER BY cos DESC, vec_id LIMIT 20),
         |ttop AS (SELECT doc_id, bm25,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS trank
         |  FROM agg WHERE doc_id <> 0 ORDER BY bm25 DESC, doc_id LIMIT 20),
         |fused AS (
         |  SELECT COALESCE(d.vec_id, t.doc_id) AS id, d.vrank, t.trank,
         |    COALESCE(1.0 / (CAST(60 AS DOUBLE) + CAST(d.vrank AS DOUBLE)), 0.0) +
         |    COALESCE(1.0 / (CAST(60 AS DOUBLE) + CAST(t.trank AS DOUBLE)), 0.0) AS rrf
         |  FROM dtop d FULL OUTER JOIN ttop t ON d.vec_id = t.doc_id)
         |SELECT id, vrank, trank, rrf FROM fused
         |ORDER BY rrf DESC, id LIMIT 10""".stripMargin,
    // Unrolled greedy MMR over the multi-probe top-10: s1 is the most
    // relevant candidate; each round adds the argmax of
    // 0.5·cos − 0.5·max-sim-to-picked (vec_id tie-break).
    "n11_mmr" ->
      s"""WITH ${Similarity.multiProbeCtes},
         |cand AS (SELECT m.vec_id, m.cos, e.embedding
         |  FROM mp m JOIN embeddings e USING (vec_id)
         |  ORDER BY m.cos DESC, m.vec_id LIMIT $MmrCand),
         |s1 AS (SELECT vec_id, cos, embedding, CAST(1 AS BIGINT) AS pick
         |  FROM cand ORDER BY cos DESC, vec_id LIMIT 1),
         |${(2 to MmrK).map(mmrRoundSql).mkString(",\n")}
         |SELECT pick, vec_id, cos FROM s$MmrK ORDER BY pick""".stripMargin
  )
}
