package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Unigram

/** Unigram-LM tokenizer (x57/x58): toy corpora pin the Viterbi
  * objective (max-likelihood segmentation under exact-decimal path
  * costs), the single-character coverage guarantee, the hard-EM refit,
  * and the long-word fallback; gate-level tests pin the encode bounds
  * and the broadcast plan shape.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("a dominant whole word beats its sub-segmentations") {
    // one word type "abab" (wc 3): every substring candidate clears
    // MinCount; the single-piece path ln(3/30) ≈ −2.30 beats "ab ab"
    // (2·ln(6/30) ≈ −3.22) and every char path, so the refit model is
    // exactly the whole word — and its refit log-prob is ln(3/3) = 0
    val m = Unigram.train(docs("abab abab abab")).collect()
    assert(m.length === 1)
    assert((m(0).getString(0), m(0).getLong(1)) === ("abab", 3L))
    assert(m(0).getDouble(2) === 0.0)
  }

  test("single-character coverage: a hapax word still segments") {
    // "qz" appears once: its multi-char substrings fall below MinCount,
    // but single characters are kept unconditionally, so the word
    // segments as characters and the refit model carries them. ("aa"
    // also chars-segments here — 2·ln(6/11) beats ln(3/11) because the
    // seed sees 'a' twice per word: the objective, working as spelled.)
    val m = Unigram.train(docs("aa aa aa qz")).collect()
    val pieces = m.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pieces.contains("q") && pieces.contains("z"))
    assert(pieces("a") === 6L)
  }

  test("frequent pieces win inside longer words (the unigram objective)") {
    // freq(abc) = 5 (4 whole-word + 1 inside xabc); "xabc" itself is a
    // hapax (dropped), so its best path is "x abc" — the frequent piece
    // is reused inside the longer word, which is the point of the
    // unigram model over greedy merges
    val m = Unigram.train(docs("abc abc abc abc xabc")).collect()
    val pieces = m.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pieces === Map("abc" -> 5L, "x" -> 1L))
    val enc = Unigram.encode(docs("abc abc abc abc xabc")).collect()
    assert((enc(0).getLong(1), enc(0).getLong(2)) === (5L, 6L)) // 4×1 + 2
  }

  test("words longer than MaxWordLen fall back to character counts at encode") {
    // "abcdefghij" (10 chars) exceeds the composition table: it is
    // never segmented (its substrings still seed candidates, but no
    // full-coverage composition exists), contributes nothing to the
    // refit model, and encodes as its character count
    val toy = docs("abcdefghij abcdefghij aa aa")
    val m = Unigram.train(toy).collect()
    assert(m.map(r => r.getString(0) -> r.getLong(1)).toMap === Map("aa" -> 2L))
    val enc = Unigram.encode(toy).collect()
    assert((enc(0).getLong(1), enc(0).getLong(2)) === (4L, 22L)) // 10+10+1+1
  }

  test("training is deterministic: exact-decimal costs admit no run-to-run drift") {
    val a = Unigram.train(docs("abab abba baba ab ab ba")).collect().toSeq
    val b = Unigram.train(docs("abab abba baba ab ab ba")).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("prune keeps all characters plus at most PruneKeep multi-char pieces; coverage survives") {
    // the vocabulary-shrink step: multi-char survivors are capped,
    // chars are not (every word must keep a segmentation), and the
    // re-fit counts cover the whole corpus — each token contributes at
    // least one piece occurrence
    val toy = docs("abab abab abab cdcd cdcd efef qq")
    val pruned = Unigram.prune(toy).collect()
    val pieces = pruned.map(_.getString(0))
    assert(pieces.nonEmpty && pieces.distinct.length === pieces.length)
    assert(pieces.count(_.length >= 2) <= Unigram.PruneKeep)
    assert(pruned.map(_.getLong(1)).sum >= 7L,
      "every corpus token re-segments into >= 1 piece")
    // deterministic like train: exact-decimal costs, total-order ranks
    assert(Unigram.prune(toy).collect().toSeq === pruned.toSeq)
  }

  test("prune redistributes: a word whose piece is pruned re-segments into its characters") {
    // 17 three-char word types over DISJOINT alphabets (no shared
    // substrings — shared prefixes would let a heavy 2-gram beat the
    // whole-word piece in pass 1) with distinct counts 2..18: pass 1
    // segments each as its whole word, so the refit table holds
    // exactly 17 multi-char pieces and NO characters. The cap keeps
    // 16, dropping "abc" (count 2) — whose only remaining path is its
    // characters, which must enter the pruned vocabulary FROM THE
    // CORPUS CHAR SET at the floor count (the case that caught the
    // bug: chars taken from the refit table alone would leave the
    // dropped word with no path and silently erase it from the model)
    val alphabet = (('a' to 'z') ++ ('A' to 'Z')).mkString
    val types = (0 until 17).map(i => alphabet.substring(3 * i, 3 * i + 3))
    val text = types.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(i + 2)(w) }.mkString(" ")
    val pruned = Unigram.prune(docs(text)).collect()
    val pieces = pruned.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!pieces.contains("abc"), "the cap's loser leaves the model")
    assert(pieces.count(_._1.length >= 2) === 16)
    // "abc"'s two occurrences re-segment as a,b,c — its chars carry
    // its weight; every other word keeps its whole-word piece + count
    assert(pieces("a") === 2L && pieces("b") === 2L && pieces("c") === 2L)
    types.drop(1).zipWithIndex.foreach { case (w, i) =>
      assert(pieces(w) === (i + 3).toLong, s"surviving piece $w")
    }
  }

  test("x59 gate: the pruned vocabulary respects the cap and stays positive") {
    val m = SparkEntry.queries("x59_unigram_prune")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(m.nonEmpty)
    assert(m.count(_.getString(0).length >= 2) <= Unigram.PruneKeep)
    assert(m.forall(_.getLong(1) > 0))
    assert(m.forall(_.getDouble(2) <= 0.0))
  }

  test("x57 gate: pieces are bounded by MaxPieceLen and counts are positive") {
    val m = SparkEntry.queries("x57_unigram_train")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(m.nonEmpty)
    assert(m.forall(_.getString(0).length <= Unigram.MaxPieceLen))
    assert(m.forall(_.getLong(1) > 0))
    // refit log-probs are genuine log relative frequencies: all ≤ 0,
    // and the most frequent piece carries the largest
    val logps = m.map(_.getDouble(2))
    assert(logps.forall(_ <= 0.0))
    assert(logps.head === logps.max)
  }

  test("x58 gate: per-doc piece counts sit between word counts and char counts") {
    val enc = SparkEntry.queries("x58_unigram_encode")(spark, "/root/testdata/sf0.001")
    val chars = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val bad = enc.join(chars, "doc_id")
      .filter(col("n_unigram_tokens") < col("n_words") ||
        col("n_unigram_tokens") > col("n_chars"))
    assert(bad.count() === 0)
  }

  test("x58 gate joins the model broadcast; no corpus-keyed sort-merge") {
    val df = SparkEntry.queries("x58_unigram_encode")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"the model must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no corpus-keyed SMJ expected:\n$plan")
  }
}
