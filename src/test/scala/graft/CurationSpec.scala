package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation

/** Behavior tests for the curation operators (x16-x18, o4) on hand-built
  * fixtures — semantics beyond what the hash gate's fixed corpus shows.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("qualityRules measures and verdict on a constructed document") {
    // 5 tokens, 4 single-char + 1 ten-char word: mean = (len-4)/5
    val docs = Seq((1L, "a a a a aaaaaaaaaa"), (2L, ("the of to and a " * 4).trim))
      .toDF("doc_id", "text")
    val r = Curation.qualityRules(docs,
      Curation.QualityRules(minWords = 1, maxWords = 100,
        minMeanWordLen = 0.0, maxMeanWordLen = 100.0,
        minStopFrac = 0.0, minDistinctFrac = 0.0))
      .orderBy("doc_id").collect()
    val d1 = r(0)
    assert(d1.getLong(1) === 5L) // n_words
    assert(math.abs(d1.getDouble(2) - 14.0 / 5.0) < 1e-12) // mean_word_len
    assert(math.abs(d1.getDouble(3) - 4.0 / 5.0) < 1e-12)  // the four 'a's
    assert(math.abs(d1.getDouble(4) - 2.0 / 5.0) < 1e-12)  // distinct {a, aaaa..}
    assert(d1.getBoolean(5), "permissive thresholds must admit")
    // strict distinct-frac: doc 1 (2/5 = 0.4) clears it, the all-stopword
    // doc 2 (5/20 = 0.25) does not
    val strict = Curation.qualityRules(docs,
      Curation.QualityRules(minWords = 1, minMeanWordLen = 0.0,
        minStopFrac = 0.0, minDistinctFrac = 0.39)).orderBy("doc_id").collect()
    assert(strict(0).getBoolean(5) && !strict(1).getBoolean(5))
  }

  test("bigramPairs emits adjacent pairs and skips sub-2-token docs") {
    val docs = Seq((1L, "a b c"), (2L, "solo")).toDF("doc_id", "text")
    val pairs = Curation.bigramPairs(docs).orderBy("doc_id", "w1", "w2").collect()
    assert(pairs.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      Seq((1L, "a", "b"), (1L, "b", "c")))
  }

  test("bigramLm scores a common continuation above a rare one") {
    // "x y" dominates; "x z" appears once — p(y|x) >> p(z|x)
    val docs = (Seq.fill(9)("x y").zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (9L, "x z")).toDF("doc_id", "text")
    val lm = Curation.bigramLm(docs, lambda = 0.9, fluentAt = -100.0)
      .orderBy("doc_id").collect()
    val common = lm(0).getDouble(2) // avg_logp of an "x y" doc
    val rare = lm(9).getDouble(2)   // the "x z" doc
    assert(common > rare, s"p(y|x) doc must outscore p(z|x) doc: $common vs $rare")
    assert(lm.forall(_.getBoolean(3)), "fluentAt=-100 admits all")
    // lambda=0 is pure unigram: both docs score p_uni(y) vs p_uni(z)
    val uni = Curation.bigramLm(docs, lambda = 0.0, fluentAt = -100.0)
      .orderBy("doc_id").collect()
    assert(uni(0).getDouble(2) > uni(9).getDouble(2),
      "unigram backoff: y occurs 9x, z once")
  }

  test("textrank concentrates rank on the hub word") {
    // star graph: every bigram points into 'hub'
    val docs = Seq((1L, "a hub"), (2L, "b hub"), (3L, "c hub"), (4L, "hub a"))
      .toDF("doc_id", "text")
    val r = Curation.textrank(docs).collect()
      .map(row => row.getString(0) -> row.getDouble(1)).toMap
    assert(r("hub") > r("b") && r("hub") > r("c"),
      s"hub word must out-rank leaves: $r")
    // rank mass stays bounded: each round emits (1-d)/N + d * inflow
    assert(r.values.sum <= 1.0 + 1e-6, s"rank mass exceeded 1: ${r.values.sum}")
  }

  test("textrank with zero damping is uniform") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = Curation.textrank(docs, iters = 2, damping = 0.0).collect()
    val ranks = r.map(_.getDouble(1)).distinct
    assert(ranks.length === 1, s"d=0 must give uniform 1/N ranks: ${r.toSeq}")
  }

  test("cmsFreq never undercounts; widening the sketch tightens estimates") {
    val rows = (1 to 60).map(i => Tuple1((i % 7).toLong)).toDF("k")
    val narrow = operators.Curation.cmsFreq(rows, "k", depth = 2, width = 4).collect()
    assert(narrow.length === 7)
    narrow.foreach { r =>
      assert(r.getLong(3) >= 0L, s"CMS undercounted: $r") // overcount
      assert(r.getLong(2) <= 60L, "estimate bounded by stream length")
    }
    // width 4096 over 7 keys: md5 buckets collide with odds ~ 1e-2 —
    // this fixed fixture is collision-free, so estimates are exact
    val wide = operators.Curation.cmsFreq(rows, "k", depth = 4, width = 4096).collect()
    assert(wide.forall(_.getLong(3) === 0L),
      s"wide sketch must be exact on 7 keys: ${wide.toSeq}")
  }

  test("hllDistinct estimates within HLL error bounds; registers merge by max") {
    val rows = (1 to 5000).map(i => Tuple1((i % 900).toLong)).toDF("k")
    val r = operators.Curation.hllDistinct(rows, "k").collect().head
    val (est, tru) = (r.getDouble(3), r.getLong(4))
    assert(tru === 900L)
    // 64 registers → ~1.04/sqrt(64) = 13% standard error; allow 3σ
    assert(math.abs(est - tru) / tru < 0.4, s"HLL estimate off: $est vs $tru")
    // duplicate-insensitive: the same keys repeated change nothing
    val dup = rows.union(rows)
    val r2 = operators.Curation.hllDistinct(dup, "k").collect().head
    assert(r2.getDouble(3) === est, "registers are max-merged, duplicates free")
    // small cardinality takes the linear-counting branch and lands close
    val small = (1 to 200).map(i => Tuple1((i % 12).toLong)).toDF("k")
    val r3 = operators.Curation.hllDistinct(small, "k").collect().head
    assert(r3.getLong(4) === 12L && math.abs(r3.getDouble(3) - 12.0) < 4.0,
      s"linear counting should be tight at 12 keys: ${r3.getDouble(3)}")
  }

  test("zvalue interleaves bits (matches a reference implementation)") {
    def ref(x: Long, y: Long): Long =
      (0 until 11).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L), (1023L, 1023L),
      (597L, 311L), (1023L, 1439L), (0L, 2047L)) // full minute-of-day range
    val got = cases.toDF("x", "y")
      .select(Curation.zvalue(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    assert(got.toSeq === cases.map { case (x, y) => ref(x, y) })
    // z-range query covers a rectangle: consecutive z with same high bits
    // share both coordinate prefixes
    assert(ref(4L, 4L) >> 6 === ref(5L, 5L) >> 6)
  }

  test("zvalue raises on out-of-range keys instead of silently aliasing") {
    // 2048 needs bit 11 — with bits=11 it would silently collide with 0
    // (the round-8 o4 defect: minute-of-day bit 10 dropped at bits=10)
    val bad = Seq((2048L, 3L)).toDF("x", "y")
    val e = intercept[Exception](
      bad.select(Curation.zvalue(col("x"), col("y"))).collect())
    assert(e.getMessage.contains("zvalue") ||
      Option(e.getCause).exists(_.getMessage.contains("zvalue")))
    val neg = Seq((3L, -1L)).toDF("x", "y")
    intercept[Exception](
      neg.select(Curation.zvalue(col("x"), col("y"))).collect())
    // in-range maxima pass
    val ok = Seq((2047L, 2047L)).toDF("x", "y")
      .select(Curation.zvalue(col("x"), col("y"))).collect()
    assert(ok.head.getLong(0) === (0 until 22).map(1L << _).sum)
  }

  test("bigramLm minDf caps the broadcast model; pruned pairs back off to unigram") {
    // "x y" is frequent (df 9); every "q<i> r<i>" bigram is unique (df 1)
    // — the Zipf tail that blows up the broadcast table at corpus scale
    val docs = (Seq.tabulate(9)(i => (i.toLong, "x y")) ++
      Seq.tabulate(6)(i => (100L + i, s"q$i r$i"))).toDF("doc_id", "text")
    val uncapped = Curation.bigramLm(docs, lambda = 0.7, fluentAt = -100.0)
      .orderBy("doc_id").collect()
    val capped = Curation.bigramLm(docs, lambda = 0.7, fluentAt = -100.0, minDf = 2L)
      .orderBy("doc_id").collect()
    // every pair still scores (n_bigrams unchanged) — the cap prunes the
    // MODEL, it never drops documents
    assert(capped.map(_.getLong(1)).toSeq === uncapped.map(_.getLong(1)).toSeq)
    // the frequent bigram clears the cap: its docs score identically
    assert(capped(0).getDouble(2) === uncapped(0).getDouble(2))
    // a pruned unique bigram backs off to ln((1-λ)·p(w2)): lower than its
    // uncapped interpolated score, and exactly the λ=0 unigram leg
    val r9 = capped(9) // first q/r doc
    assert(r9.getDouble(2) < uncapped(9).getDouble(2))
    // same op spelling as the operator: (1-λ) and p(w2) in IEEE order,
    // ln rounded to 9 digits HALF_UP (±5e-13 for the decimal round trip)
    val expected = BigDecimal.decimal(math.log((1.0 - 0.7) * (1.0 / 30.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r9.getDouble(2) - expected) < 1e-10,
      s"backoff must be the unigram leg: ${r9.getDouble(2)} vs $expected")
  }

  test("lmScoreCross: train/score separation, unseen-bigram backoff, OOV drop") {
    // model trains ONLY on docs 1-2; corpus also has 10 (reordered in-vocab
    // words → unseen bigrams) and 11 (entirely out-of-vocabulary)
    val train = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val corpus = (Seq((1L, "a b c"), (2L, "a b d"),
      (10L, "c b a"), (11L, "zz yy")))
      .toDF("doc_id", "text")
    val got = Curation.lmScoreCross(train, corpus).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 11 shares no vocabulary with the training domain: no row at all
    assert(got.keySet === Set(1L, 2L, 10L), "OOV-only docs must drop, not score 0")
    // train vocab: tokens a,b×2? a b c a b d → total 6; p(b)=2/6, p(a)=2/6, p(c)=p(d)=1/6
    // doc 10 pairs: (c,b) and (b,a) — both unseen bigrams → unigram leg only
    val lnUnigram = (w2Count: Long) => BigDecimal.decimal(
      math.log((1.0 - 0.7) * (w2Count.toDouble / 6.0)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected10 = (lnUnigram(2) + lnUnigram(2)) / 2.0 // p(b), p(a)
    assert(got(10L)._1 === 2L)
    assert(math.abs(got(10L)._2 - expected10) < 1e-9,
      s"unseen bigrams must back off to the unigram leg: ${got(10L)._2} vs $expected10")
    // in-domain docs score strictly better than the reordered one
    assert(got(1L)._2 > got(10L)._2 && got(2L)._2 > got(10L)._2)
  }

  test("nbClassifier: Laplace-smoothed log-odds match hand arithmetic; verdict flips") {
    // vocab {good, text, bad}: t_pos = t_neg = 2, V = 3, prior ln(1/1) = 0
    val docs = Seq((1L, "good text", "en"), (2L, "bad text", "xx"))
      .toDF("doc_id", "text", "lang")
    val got = Curation.nbClassifier(docs, col("lang") === "en")
      .orderBy("doc_id").collect()
    def r9(x: Double) = BigDecimal.decimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // w_lo: good = ln(2/5)−ln(1/5) = ln 2, text = 0, bad = −ln 2
    val ln2 = r9(math.log(2.0 / 5.0) - math.log(1.0 / 5.0))
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(math.abs(got(0).getDouble(2) - ln2) < 1e-12 && got(0).getBoolean(3))
    assert(math.abs(got(1).getDouble(2) + ln2) < 1e-12 && !got(1).getBoolean(3))
    assert(got.forall(_.getLong(1) === 2L), "n_tokens counts every token")
  }

  test("kmeansAssign separates obvious clusters at caller-chosen k") {
    // Two tight blobs in 2-d, membership aligned with vec_id parity so
    // the deterministic vec_id%k seed starts near the blobs (a parity-
    // symmetric fixture would seed both centroids at the midpoint —
    // Lloyd's is only as good as its seed, here as anywhere). The test
    // pins the MECHANICS: every vector assigned once, cells in [0,k),
    // iteration converging on the separation.
    val blobA = Seq.tabulate(8)(i => (2L * i, Array(0.9f + 0.01f * i, 0.1f)))
    val blobB = Seq.tabulate(8)(i => (2L * i + 1L, Array(0.1f, 0.9f + 0.01f * i)))
    val vecs = (blobA ++ blobB).toDF("vec_id", "embedding")
    val asg = operators.Ivf.kmeansAssign(vecs, k = 2, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg.size === 16, "every vector assigned exactly once")
    assert(asg.values.forall(c => c >= 0 && c < 2))
    val cellsA = blobA.map(v => asg(v._1)).toSet
    val cellsB = blobB.map(v => asg(v._1)).toSet
    assert(cellsA.size === 1 && cellsB.size === 1 && cellsA != cellsB,
      s"blobs must land in distinct cells: $cellsA vs $cellsB")
  }

  test("nbScoreWith scores unseen tokens at the smoothed floor, never drops them") {
    import spark.implicits._
    val train = Seq(
      (1L, "good clean prose text here", true),
      (2L, "bad noisy spam junk words", false)).toDF("doc_id", "text", "pos")
    val byClass = train.select(col("doc_id"), col("pos"),
        explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("c_neg"))
    val prior = train.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("n_neg"))
    // a doc made ENTIRELY of out-of-vocabulary words still gets a
    // verdict (the scaladoc's smoothed-floor contract — an inner join
    // would emit no row for exactly the most novel documents), with
    // every token counted
    val novel = Seq((10L, "zzz qqq www")).toDF("doc_id", "text")
    val out = operators.Curation.nbScoreWith(novel, byClass, prior).collect()
    assert(out.length === 1, "novel doc must still be scored")
    assert(out.head.getLong(1) === 3L, "all unseen tokens counted")
    // balanced classes (t_pos = t_neg = 5, equal priors): the floor
    // log-odds of every unseen token is exactly 0
    assert(out.head.getDouble(2) === 0.0, s"balanced floor must be 0: ${out.head}")
    // a mixed doc counts seen AND unseen tokens
    val mixed = Seq((11L, "good zzz")).toDF("doc_id", "text")
    val m = operators.Curation.nbScoreWith(mixed, byClass, prior).collect()
    assert(m.head.getLong(1) === 2L)
    assert(m.head.getDouble(2) > 0.0, "the seen positive token must dominate")
  }
}
