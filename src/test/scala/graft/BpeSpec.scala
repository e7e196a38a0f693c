package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE merge learning: known-merge toy corpora pin the counting, the
  * lexicographic tie-break, and the left-to-right non-overlapping merge
  * application (the subtle part — the fold's boundary check).
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("learns the dominant pair first; ties break lexicographically") {
    // "the" x3 -> pairs (t,h) and (h,e) each 3; cat/hat/bat give (a,t) 3.
    // All tie at 3 -> lexicographic argmax picks (a,t).
    val m = Bpe.merges(docs("the cat the hat", "the bat"), rounds = 2).collect()
    assert(m.length === 2)
    assert((m(0).getString(1), m(0).getString(2), m(0).getLong(4)) === ("a", "t", 3L))
    assert(m(0).getString(3) === "at")
    // after merging, words are [t h e]x3 [c at] [h at] [b at]: (h,e)=3
    // outranks (t,h)=3 lexicographically? No: (h,e) < (t,h) -> (h,e).
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(4)) === ("h", "e", 3L))
  }

  test("merge application is left-to-right non-overlapping") {
    // Word "aaaa" = a a a a: pair (a,a) counts 3 per occurrence, x2 words.
    // Applying (a,a) left-to-right gives [aa][aa], NOT [a][aa][a] or
    // overlapped triples — so round 2's top pair must be (aa,aa).
    val m = Bpe.merges(docs("aaaa aaaa"), rounds = 2).collect()
    assert((m(0).getString(1), m(0).getString(2)) === ("a", "a"))
    assert((m(1).getString(1), m(1).getString(2), m(1).getString(3)) === ("aa", "aa", "aaaa"))
  }

  test("merged symbols participate as units in later rounds") {
    // "ab" dominates; then ("ab","c") must beat any single-char pair,
    // and the c of "abc" must attach to the MERGED ab, not to b alone.
    val m = Bpe.merges(docs("abc abc abc abd"), rounds = 2).collect()
    assert((m(0).getString(1), m(0).getString(2)) === ("a", "b"))
    assert((m(1).getString(1), m(1).getString(2), m(1).getLong(4)) === ("ab", "c", 3L))
  }

  test("encode applies the trained merges: per-doc counts shrink correctly") {
    // merges: (a,b) then (ab,c); vocab after: abc -> [abc], abd -> [ab, d]
    val out = Bpe.encode(docs("abc abc abc abd"), rounds = 2).collect()
    assert(out.length === 1)
    assert((out(0).getLong(1), out(0).getLong(2)) === (4L, 5L)) // 1+1+1+2
  }

  test("x21 encode counts are bounded by chars below and words above") {
    val enc = SparkEntry.queries("x21_bpe_encode")(spark, "/root/testdata/sf0.001")
    val chars = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val bad = enc.join(chars, "doc_id")
      .filter(col("n_bpe_tokens") < col("n_words") || col("n_bpe_tokens") > col("n_chars"))
    assert(bad.count() === 0)
  }

  test("x21 encode joins the vocab broadcast; no corpus-keyed sort-merge") {
    val df = SparkEntry.queries("x21_bpe_encode")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no corpus-keyed SMJ expected:\n$plan")
  }

  test("x20 gate query returns 3 deterministic rounds on the corpus") {
    val out = SparkEntry.queries("x20_bpe_train")(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 3)
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    // counts are corpus-frequency-weighted and strictly positive, and
    // each round's winning count can only shrink or hold as pairs merge
    val counts = out.map(_.getLong(4))
    assert(counts.forall(_ > 0))
    // merged spelling is the concatenation of its parts
    out.foreach(r => assert(r.getString(3) === r.getString(1) + r.getString(2)))
  }

  test("mergeFold equals the imperative left-to-right reference fold (randomized)") {
    import spark.implicits._
    // the semantics mergeFold's Column fold must reproduce: merge when
    // the PREVIOUS emitted symbol is exactly l and the next is r; the
    // merged symbol never re-merges with a following r in the same pass
    def ref(syms: Seq[String], l: String, r: String): String = {
      val out = scala.collection.mutable.Buffer.empty[String]
      syms.foreach { x =>
        if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
        else out += x
      }
      out.mkString(" ")
    }
    val alphabet = Vector("a", "b", "ab", "aa", "c")
    val rnd = new scala.util.Random(41) // fixed seed: deterministic corpus
    val cases = (0 until 120).map { i =>
      val n = rnd.nextInt(9)
      (i.toLong, Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(" "))
    }
    val pairs = Seq(("a", "a"), ("a", "b"), ("ab", "c"), ("aa", "a"), ("b", "c"))
    val df = cases.toDF("id", "seq")
    val folded = df.select(col("id") +: pairs.zipWithIndex.map { case ((l, r), i) =>
      Bpe.mergeFold(col("seq"), l, r).as(s"m$i") }: _*)
      .collect().map(row => row.getLong(0) -> row).toMap
    cases.foreach { case (id, seqStr) =>
      val syms = if (seqStr.isEmpty) Nil else seqStr.split(" ").toSeq
      pairs.zipWithIndex.foreach { case ((l, r), i) =>
        assert(folded(id).getString(i + 1) === ref(syms, l, r),
          s"id=$id seq='$seqStr' pair=($l,$r)")
      }
    }
  }
}
