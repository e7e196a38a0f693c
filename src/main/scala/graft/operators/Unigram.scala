package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Unigram-LM tokenizer training and encoding (Kudo 2018, the
  * SentencePiece unigram model — public) — the OTHER production
  * tokenizer next to BPE (x20/x21): instead of greedy pair merges, a
  * unigram language model over a candidate piece vocabulary, with each
  * word segmented by VITERBI into its maximum-likelihood piece
  * sequence and the model refit from the segmentations (hard EM).
  *
  * The round here: (1) seed candidates = every substring of the
  * word vocabulary up to [[MaxPieceLen]] chars with corpus frequency ≥
  * [[MinCount]], plus ALL single characters (the coverage guarantee —
  * every word always has at least its character segmentation);
  * (2) seed scores = log relative frequency; (3) Viterbi-segment every
  * distinct word (the E-step, hard assignment); (4) refit piece
  * frequencies from the segmentations weighted by word count (the
  * M-step) — the refit table IS the trained model (x57), and encoding
  * (x58) is a second Viterbi pass under the refit scores. One hard-EM
  * round, exactly the alternation SentencePiece iterates; further
  * rounds are the same two steps re-applied.
  *
  * VITERBI AS DATAFLOW — the design decision worth documenting: the
  * textbook DP (best[j] = max over i of best[i] + score(word[i..j]))
  * is sequential per position, and a layer-by-layer dataframe spelling
  * either re-derives each layer once per reference (the x53
  * chained-lineage trap — exponential plan blow-up) or needs a
  * materialization barrier per position. Instead the DP is spelled as
  * one relational block over a COMPOSITION TABLE: all ways to cut a
  * length-n word into ordered parts of ≤ [[MaxPieceLen]] chars is a
  * tiny data-INDEPENDENT constant relation (708 rows at n ≤ 8 — public
  * config, broadcast as a literal in both engines), so segmentation =
  * words ⋈ compositions (on length) ⋈ pieces (on the substring), one
  * combinable (word, composition) aggregation keeping compositions
  * whose every part matched a piece, and a per-word argmax window
  * (frames ≤ 108 candidate rows per word at n = 8). Fully declarative:
  * no loop, no checkpoint, no driver-side DP. Exactness: piece
  * log-probs are ln-rounded-to-9 doubles cast to DECIMAL(28,9) (the
  * x10 libm discipline), so the summed path cost is EXACT decimal
  * arithmetic — order-independent, engine-identical — and ties break
  * on the segmentation string, a total order.
  *
  * Scale shape at 100 TB: the corpus-proportional work is ONE
  * tokenize + word-count shuffle (the BPE `vocab0` argument — Zipf
  * keeps the distinct-word vocabulary orders of magnitude smaller than
  * the corpus) plus, for x58, the final encode join (broadcast
  * word→n_pieces into the exploded stream, one combinable per-doc
  * count — the x21 shape). Everything between is vocabulary-sized:
  * substring explode ≤ len×[[MaxPieceLen]] per distinct word,
  * composition join a constant ≤ 443-row fan-out per word, piece
  * tables broadcast. [[MaxWordLen]] bounds the composition table
  * (tetranacci growth: 108 compositions at n = 8, ~1490 at n = 12 —
  * still literal-sized); words longer than it are passed through as
  * character-count fallbacks at encode (deterministically in both
  * engines) rather than segmented — raise the constant for corpora
  * where long words carry real mass.
  *
  * Reference frame: the reference pipeline stores raw text fields
  * verbatim (python/models.py:14-30); a training-data export of the
  * same records needs exactly this tokenizer-training step, which is
  * why it sits beside BPE in the §2 north-star family.
  */
object Unigram {
  type Q = (SparkSession, String) => DataFrame

  /** Longest word the composition table covers (public config). */
  val MaxWordLen = 8

  /** Longest candidate piece (public config; SentencePiece's
    * max_sentencepiece_length analogue).
    */
  val MaxPieceLen = 4

  /** Minimum corpus frequency for a multi-char candidate piece; single
    * characters are always kept (coverage).
    */
  val MinCount = 2

  /** Vocabulary cap for the PRUNE round (x59): the multi-char pieces
    * kept, by refit count (public config; SentencePiece's vocab_size
    * analogue — its EM loop alternates refit with exactly this
    * drop-the-least-useful-pieces step until the target size).
    */
  val PruneKeep = 16

  /** All ordered compositions of 1..MaxWordLen into parts of
    * 1..MaxPieceLen, flattened to one row per part:
    * (clen, comp_id, part_idx, start, plen, n_parts). Deterministic
    * enumeration order (shorter first part first), shared VERBATIM by
    * the Spark literal frame and the oracle's VALUES list so the two
    * engines cannot disagree about candidate identity.
    */
  private lazy val comps: Seq[(Int, Int, Int, Int, Int, Int)] = {
    def cuts(n: Int): Seq[Seq[Int]] =
      if (n == 0) Seq(Seq.empty)
      else (1 to math.min(MaxPieceLen, n)).flatMap(l => cuts(n - l).map(l +: _))
    (1 to MaxWordLen).flatMap { n =>
      cuts(n).zipWithIndex.flatMap { case (parts, cid) =>
        val starts = parts.scanLeft(1)(_ + _).init
        parts.zip(starts).zipWithIndex.map { case ((plen, start), pi) =>
          (n, cid, pi, start, plen, parts.length)
        }
      }
    }
  }

  private val dec = DecimalType(28, 9)

  /** log(freq/tot) as EXACT decimal: each ln rounded to 9 (the x10
    * libm discipline), cast to DECIMAL(28,9) — a rounded-9 double is
    * within ~1e-16 of its 9-dp decimal, so both engines' double→decimal
    * casts land on the same value — then subtracted exactly. Summing
    * these along a segmentation path is order-independent decimal
    * arithmetic, which is what makes the Viterbi argmax engine-stable.
    */
  private def logpDec(freq: Column, tot: Column): Column =
    round(log(freq.cast("double")), 9).cast(dec) -
      round(log(tot.cast("double")), 9).cast(dec)

  /** Distinct words with corpus counts — the ONE corpus-shaped
    * exchange of training (the BPE `vocab0` argument).
    */
  private def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** Seed candidate pieces with DECIMAL log-probs: substrings of
    * length 1..MaxPieceLen over the word vocabulary, weighted by word
    * count (every occurrence position counts), thresholded at
    * [[MinCount]] except single chars. The length-0 guard keeps
    * Spark's `sequence(1, 0)` (which descends, unlike DuckDB's empty
    * generate_series) out of the plan for empty-string words.
    */
  private def seedPieces(wv: DataFrame): DataFrame = {
    val subs = wv.filter(length(col("word")) >= 1)
      .select(explode(expr(
        s"flatten(transform(sequence(1, length(word)), " +
          s"s -> transform(sequence(1, least($MaxPieceLen, length(word) - s + 1)), " +
          "l -> substring(word, s, l))))")).as("piece"), col("wc"))
    val freqs = subs.groupBy("piece").agg(sum(col("wc")).as("freq"))
      .filter(length(col("piece")) === 1 || col("freq") >= MinCount)
    val tot = freqs.agg(sum(col("freq")).as("tot"))
    freqs.crossJoin(broadcast(tot))
      .select(col("piece"), logpDec(col("freq"), col("tot")).as("logp"))
  }

  /** One Viterbi pass: the maximum-likelihood segmentation of every
    * distinct word under `pieces` (piece, logp DECIMAL) — the
    * composition-table spelling (see the object doc). Returns
    * (word, wc, seg). Words with no full-coverage composition (longer
    * than [[MaxWordLen]], or containing a character the piece table
    * lacks) emit no row — callers fall back at the encode join.
    */
  private def viterbi(words: DataFrame, pieces: DataFrame): DataFrame = {
    val s = words.sparkSession
    import s.implicits._
    val compsDf = comps.toDF("clen", "comp_id", "part_idx", "start", "plen", "n_parts")
    val cand = words
      .join(broadcast(compsDf), length(col("word")) === col("clen"))
      .select(col("word"), col("wc"), col("comp_id"), col("part_idx"),
        col("n_parts"), expr("substring(word, start, plen)").as("piece_str"))
      .join(broadcast(pieces), col("piece_str") === col("piece"))
    val scored = cand.groupBy("word", "wc", "comp_id", "n_parts")
      .agg(count(lit(1)).as("n_matched"), sum(col("logp")).as("cost"),
        array_join(transform(
          array_sort(collect_list(struct(col("part_idx"), col("piece")))),
          p => p.getField("piece")), " ").as("seg"))
      .filter(col("n_matched") === col("n_parts"))
    // argmax per word: exact-decimal cost desc, then the segmentation
    // string — a total order (a composition is recoverable from its
    // seg, so no two candidate rows of one word share a seg)
    val w = Window.partitionBy("word").orderBy(col("cost").desc, col("seg"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("word", "wc", "seg")
  }

  /** M-step: piece frequencies re-counted from the Viterbi
    * segmentations, weighted by word count.
    */
  private def refitCounts(best: DataFrame): DataFrame =
    best.select(explode(split(col("seg"), " ")).as("piece"), col("wc"))
      .groupBy("piece").agg(sum(col("wc")).as("refit_n"))

  // The training chain exists in ONE spelling each (r19 review: the
  // gate path — the memoized store — and the toy/spec path initially
  // re-spelled seed→Viterbi→refit→model three times; a fix applied to
  // one copy would silently desynchronize the path the specs pin from
  // the path the gates run).

  /** Seed → Viterbi pass 1 → recount: the refit table every entry
    * point builds from.
    */
  private def refitOf(wv: DataFrame): DataFrame =
    refitCounts(viterbi(wv, seedPieces(wv)))

  private def totOf(refit: DataFrame): DataFrame =
    refit.agg(sum(col("refit_n")).as("tot"))

  /** x57's output shape: each refit piece with its count and its
    * refit log-prob (a pure map of two BIGINTs — the plain-double
    * difference is deterministic, no decimal needed for OUTPUT).
    */
  private def modelFrame(refit: DataFrame, tot: DataFrame): DataFrame =
    refit.crossJoin(broadcast(tot))
      .select(col("piece"), col("refit_n"),
        (round(log(col("refit_n").cast("double")), 9) -
          round(log(col("tot").cast("double")), 9)).as("logp"))
      .orderBy(col("refit_n").desc, col("piece"))

  /** The (word, n_pieces) encode table: Viterbi pass 2 under the
    * refit scores (DECIMAL — these are summed along paths), with the
    * character-count fallback for words the table cannot cover.
    */
  private def encFrame(wv: DataFrame, refit: DataFrame,
      tot: DataFrame): DataFrame = {
    val scored = refit.crossJoin(broadcast(tot))
      .select(col("piece"), logpDec(col("refit_n"), col("tot")).as("logp"))
    wv.join(viterbi(wv, scored).select(col("word"),
        size(split(col("seg"), " ")).cast("long").as("np")), Seq("word"), "left")
      .select(col("word"),
        coalesce(col("np"), length(col("word")).cast("long")).as("n_pieces"))
  }

  /** The corpus-shaped half of encoding alone: broadcast the encode
    * table into the exploded word stream, one combinable per-doc
    * count (the x21 shape).
    */
  private def encodeWith(docs: DataFrame, enc: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(enc), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_unigram_tokens"))
      .orderBy("doc_id")

  /** The PRUNE round's surviving pieces with renormalized scores
    * (x59): every CORPUS character survives (SentencePiece's
    * required_chars — the coverage guarantee must come from the corpus
    * char set, NOT from the characters pass 1 happened to use: a word
    * whose whole-word piece is pruned and whose chars no other
    * segmentation used would otherwise have no path and silently
    * vanish from the model — r19 review, caught writing the
    * redistribution test), at its pass-1 refit count or a floor of 1
    * when unused (the minimal-probability score required chars get);
    * multi-char pieces keep the top [[PruneKeep]] by
    * (refit count desc, piece). The rank window is MODEL-sized (the
    * refit table, never the corpus) — the x44 candidate-frame license;
    * a deployment pruning a multi-million-piece vocabulary would shard
    * it by length like o6's rank.
    */
  private def pruneOf(wv: DataFrame, refit: DataFrame): DataFrame = {
    val chars = wv.filter(length(col("word")) >= 1)
      .select(explode(expr(
        "transform(sequence(1, length(word)), s -> substring(word, s, 1))"))
        .as("piece"))
      .distinct()
    val keptChars = chars.join(refit, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("refit_n"), lit(1L)).as("refit_n"))
    val multi = refit.filter(length(col("piece")) >= 2)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("refit_n").desc, col("piece"))))
      .filter(col("rk") <= PruneKeep).drop("rk")
    val kept = keptChars.unionByName(multi)
    kept.crossJoin(broadcast(totOf(kept)))
      .select(col("piece"), logpDec(col("refit_n"), col("tot")).as("logp"))
  }

  /** The trained model (x57's frame: piece, refit_n, logp) for an
    * arbitrary `(doc_id, text)` frame — the non-memoized spelling toy
    * corpora and specs drive; the gate queries route through the
    * per-dataset store ([[ensureTrained]]), which persists the seed
    * vocabulary across its internal references.
    */
  def train(docs: DataFrame): DataFrame = {
    val refit = refitOf(wordVocab(docs))
    modelFrame(refit, totOf(refit))
  }

  /** The model after one PRUNE round (x59's frame): prune the refit
    * vocabulary to [[PruneKeep]] multi-char pieces + all chars,
    * re-Viterbi every word under the renormalized survivor scores,
    * re-count — the second half of the SentencePiece EM loop (refit is
    * the E/M alternation, prune is the vocabulary-shrink step between
    * rounds). Pieces the re-segmentation abandons drop out of the
    * model; pieces that absorb their mass grow.
    */
  def prune(docs: DataFrame): DataFrame = {
    val wv = wordVocab(docs)
    val refit2 = refitCounts(viterbi(wv, pruneOf(wv, refitOf(wv))))
    modelFrame(refit2, totOf(refit2))
  }

  /** Per-doc encode accounting (x58's frame) for an arbitrary frame —
    * the non-memoized sibling of [[train]].
    */
  def encode(docs: DataFrame): DataFrame = {
    val wv = wordVocab(docs)
    val refit = refitOf(wv)
    encodeWith(docs, encFrame(wv, refit, totOf(refit)))
  }

  /** Serving-path encode of ONE text (the IntakeServe `/encode`
    * endpoint's engine): Viterbi-segment the text's distinct words
    * against the MEMOIZED per-dataset model store — x57's refit model,
    * or x59's pruned model at `pruned = true` — returning one row per
    * word POSITION (pos, word, pieces, n_pieces) so the caller can
    * reconstruct the token stream. The fallback is [[encFrame]]'s rule
    * verbatim: a word the composition table cannot cover (longer than
    * [[MaxWordLen]], or containing a character the model lacks)
    * segments into its characters via the same coalesce-at-the-join,
    * so the endpoint's n_pieces agrees with x58's gate accounting word
    * for word. Request-side frames are query-sized; the model side is
    * the vocab-sized store broadcast into the Viterbi join — one
    * bounded Spark job per request (the serving-tier discipline; the
    * FIRST request on a fresh JVM pays the training memo, like the
    * x57 gate's warmup).
    */
  def encodeText(s: SparkSession, d: String, text: String,
      pruned: Boolean = false): DataFrame = {
    import s.implicits._
    val (model, _, prunedM) = ensureTrained(s, d)
    val store = if (pruned) prunedM else model
    val scored = store.crossJoin(broadcast(totOf(store)))
      .select(col("piece"), logpDec(col("refit_n"), col("tot")).as("logp"))
    val words = text.split(" ").filter(_.nonEmpty).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toSeq.toDF("pos", "word")
    val wv = words.select(col("word")).distinct().withColumn("wc", lit(1L))
    val segs = viterbi(wv, scored).select(col("word"), col("seg"))
    words.join(segs, Seq("word"), "left")
      .select(col("pos"), col("word"),
        coalesce(col("seg"), concat_ws(" ", expr(
          "transform(sequence(1, length(word)), s -> substring(word, s, 1))")))
          .as("pieces"),
        coalesce(size(split(col("seg"), " ")).cast("long"),
          length(col("word")).cast("long")).as("n_pieces"))
      .orderBy("pos")
  }

  /** Trained-model store, materialized once per (JVM, dataset) on the
    * Bpe.ensureTrained pattern: tokenizer training is ingest-time work
    * — train once, ship the model. The memo writes two vocab-sized
    * parquet tables: `model` (piece, refit_n — x57's rows) and `enc`
    * (word, n_pieces under the refit model, char-count fallback
    * included — x58's broadcast side), so serving-path calls pay one
    * broadcast join + one combinable count and re-run no training
    * actions. Holder semantics are Bpe's verbatim: per-dataset
    * synchronization, result-only retention, losers discarded unrun.
    */
  private final class TrainedHolder {
    @volatile private var result: (String, String, String) = _
    def value(s: SparkSession, d: String): (String, String, String) = {
      val r0 = result
      if (r0 != null) r0
      else synchronized {
        if (result == null) {
          // the seed vocabulary is read by the substring explode, three
          // Viterbi passes, and the encode fallback join — persist the
          // one corpus-shaped lineage for the duration of training
          // (vocab-sized, the Bpe seed-cache argument); the refit
          // table likewise (referenced by its total, the model store,
          // the pass-2 piece side, and the prune rank)
          val wv = wordVocab(Tables.documents(s, d)).persist()
          val refit = refitOf(wv).persist()
          val modelOut = Stores.dir(s, d, "unigram-model")
          refit.write.mode("overwrite").parquet(modelOut)
          val encOut = Stores.dir(s, d, "unigram-enc")
          encFrame(wv, refit, totOf(refit))
            .write.mode("overwrite").parquet(encOut)
          val prunedOut = Stores.dir(s, d, "unigram-pruned")
          refitCounts(viterbi(wv, pruneOf(wv, refit)))
            .write.mode("overwrite").parquet(prunedOut)
          refit.unpersist(false)
          wv.unpersist(false)
          result = (modelOut, encOut, prunedOut)
        }
        result
      }
    }
  }

  private val trainedCache = scala.collection.concurrent.TrieMap
    .empty[String, TrainedHolder]

  /** (model, enc, pruned) frames from the per-dataset store — paths
    * memoized, never DataFrames (the Bpe session-rebind rationale).
    */
  def ensureTrained(s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val (m, e, p) = trainedCache.getOrElseUpdate(d, new TrainedHolder).value(s, d)
    (s.read.parquet(m), s.read.parquet(e), s.read.parquet(p))
  }

  def queries: Map[String, Q] = Map(
    // x57: the trained unigram model — every piece the Viterbi
    // segmentation actually used, its refit count, and its refit
    // log-prob (ln-rounded-to-9 in both engines).
    "x57_unigram_train" -> { (s, d) =>
      val refit = ensureTrained(s, d)._1
      modelFrame(refit, totOf(refit))
    },
    // x58: per-doc token accounting under the refit model — words
    // before, unigram pieces after (the x21 compression-accounting
    // shape; the corpus-side work is one broadcast join + one
    // combinable count).
    "x58_unigram_encode" -> ((s, d) =>
      encodeWith(Tables.documents(s, d), ensureTrained(s, d)._2)),
    // x59: the model after one PRUNE round — survivors of the
    // vocabulary cap re-fit under a fresh Viterbi pass; the
    // vocabulary-shrink step that makes unigram training a LOOP.
    "x59_unigram_prune" -> { (s, d) =>
      val pruned = ensureTrained(s, d)._3
      modelFrame(pruned, totOf(pruned))
    }
  )

  // ---- oracle SQL ------------------------------------------------------

  private def compValues: String =
    comps.map { case (n, cid, pi, st, pl, np) => s"($n,$cid,$pi,$st,$pl,$np)" }
      .grouped(8).map(_.mkString(", ")).mkString(",\n|    ")

  /** One Viterbi pass as CTEs `cand$tag`/`m$tag`/`best$tag` over the
    * shared `compst`/`wv` and a (piece, logp DECIMAL) CTE.
    */
  private def viterbiCtes(tag: String, piecesCte: String): String =
    s"""cand$tag AS (SELECT w.word, w.wc, c.comp_id, c.n_parts, c.part_idx,
       |    substr(w.word, c.start, c.plen) AS piece_str
       |  FROM wv w JOIN compst c ON len(w.word) = c.clen),
       |m$tag AS (SELECT cand.word, cand.wc, cand.comp_id, cand.n_parts,
       |    count(*) AS n_matched, sum(p.logp) AS cost,
       |    string_agg(p.piece, ' ' ORDER BY cand.part_idx) AS seg
       |  FROM cand$tag cand JOIN $piecesCte p ON cand.piece_str = p.piece
       |  GROUP BY 1, 2, 3, 4),
       |best$tag AS (SELECT word, wc, seg FROM (
       |    SELECT word, wc, seg, row_number() OVER (PARTITION BY word
       |      ORDER BY cost DESC, seg) AS rk
       |    FROM m$tag WHERE n_matched = n_parts) WHERE rk = 1)""".stripMargin

  /** Shared oracle prefix: the composition literal, tokenize + word
    * vocab, substring seed with log-prob decimals, Viterbi pass 1, and
    * the refit counts (`ref`) + total (`t1`).
    */
  private def chain: String =
    s"""compst AS (SELECT * FROM (VALUES $compValues)
       |  AS t(clen, comp_id, part_idx, start, plen, n_parts)),
       |toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |wv AS (SELECT word, CAST(count(*) AS BIGINT) AS wc FROM toks GROUP BY word),
       |starts AS (SELECT word, wc, unnest(generate_series(1, len(word))) AS s
       |  FROM wv WHERE len(word) >= 1),
       |subs AS (SELECT substr(word, s, l) AS piece, wc FROM (
       |    SELECT word, wc, s,
       |      unnest(generate_series(1, least($MaxPieceLen, len(word) - s + 1))) AS l
       |    FROM starts)),
       |p0f AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS freq FROM subs
       |  GROUP BY piece HAVING len(piece) = 1 OR CAST(sum(wc) AS BIGINT) >= $MinCount),
       |t0 AS (SELECT CAST(sum(freq) AS BIGINT) AS tot FROM p0f),
       |p0 AS (SELECT piece,
       |    CAST(round(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(28,9)) -
       |    CAST(round(ln(CAST(tot AS DOUBLE)), 9) AS DECIMAL(28,9)) AS logp
       |  FROM p0f, t0),
       |${viterbiCtes("1", "p0")},
       |ref AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS refit_n FROM (
       |    SELECT unnest(string_split(seg, ' ')) AS piece, wc FROM best1)
       |  GROUP BY piece),
       |t1 AS (SELECT CAST(sum(refit_n) AS BIGINT) AS tot FROM ref)""".stripMargin

  def oracles: Map[String, String] = Map(
    "x57_unigram_train" ->
      s"""WITH $chain
         |SELECT piece, refit_n,
         |  round(ln(CAST(refit_n AS DOUBLE)), 9) -
         |    round(ln(CAST(tot AS DOUBLE)), 9) AS logp
         |FROM ref, t1 ORDER BY refit_n DESC, piece""".stripMargin,
    "x58_unigram_encode" ->
      s"""WITH $chain,
         |p1 AS (SELECT piece,
         |    CAST(round(ln(CAST(refit_n AS DOUBLE)), 9) AS DECIMAL(28,9)) -
         |    CAST(round(ln(CAST(tot AS DOUBLE)), 9) AS DECIMAL(28,9)) AS logp
         |  FROM ref, t1),
         |${viterbiCtes("2", "p1")},
         |enc AS (SELECT wv.word,
         |    coalesce(CAST(len(string_split(best2.seg, ' ')) AS BIGINT),
         |      CAST(len(wv.word) AS BIGINT)) AS n_pieces
         |  FROM wv LEFT JOIN best2 ON wv.word = best2.word),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_pieces) AS BIGINT) AS n_unigram_tokens
         |FROM tok JOIN enc USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // x59: prune the refit vocabulary (ALL corpus chars at refit count
    // or floor 1, + top-PruneKeep multi-char by (refit_n desc, piece)),
    // renormalize, re-Viterbi, re-count — same decimal/tie-break
    // spellings as the passes above.
    "x59_unigram_prune" ->
      s"""WITH $chain,
         |chr AS (SELECT DISTINCT substr(word, s, 1) AS piece FROM starts),
         |keptc AS (SELECT chr.piece,
         |    coalesce(ref.refit_n, CAST(1 AS BIGINT)) AS refit_n
         |  FROM chr LEFT JOIN ref ON chr.piece = ref.piece),
         |pm AS (SELECT piece, refit_n,
         |    row_number() OVER (ORDER BY refit_n DESC, piece) AS rk
         |  FROM ref WHERE len(piece) >= 2),
         |keptp AS (SELECT piece, refit_n FROM keptc
         |  UNION ALL SELECT piece, refit_n FROM pm WHERE rk <= $PruneKeep),
         |t2 AS (SELECT CAST(sum(refit_n) AS BIGINT) AS tot FROM keptp),
         |p2 AS (SELECT piece,
         |    CAST(round(ln(CAST(refit_n AS DOUBLE)), 9) AS DECIMAL(28,9)) -
         |    CAST(round(ln(CAST(tot AS DOUBLE)), 9) AS DECIMAL(28,9)) AS logp
         |  FROM keptp, t2),
         |${viterbiCtes("2", "p2")},
         |ref2 AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS refit_n FROM (
         |    SELECT unnest(string_split(seg, ' ')) AS piece, wc FROM best2)
         |  GROUP BY piece),
         |t3 AS (SELECT CAST(sum(refit_n) AS BIGINT) AS tot FROM ref2)
         |SELECT piece, refit_n,
         |  round(ln(CAST(refit_n AS DOUBLE)), 9) -
         |    round(ln(CAST(tot AS DOUBLE)), 9) AS logp
         |FROM ref2, t3 ORDER BY refit_n DESC, piece""".stripMargin
  )
}
