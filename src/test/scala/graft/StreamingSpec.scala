package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamDemos
import graft.streaming.StreamDemos.Ev

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  final case class REv(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class RDoc(ts: Timestamp, text: String, source: String)

  test("windowed counts finalize once the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[REv]
    val q = StreamDemos.windowedCounts(ms.toDF())
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      ms.addData(
        REv(1, ts(5), 1, "click", 1.5),
        REv(2, ts(10), 1, "click", 2.5),
        REv(3, ts(20), 2, "buy", 4.0))
      q.processAllAvailable()
      // advance event time beyond hour 0 + watermark → finalizes hour 0
      ms.addData(REv(4, ts(200), 1, "click", 1.0))
      q.processAllAvailable()
      ms.addData(REv(5, ts(400), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
        .map(r => (r.getAs[Timestamp]("hour_start").getTime / 60000, r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
      assert(rows.contains((0L, "click", 2L, 4.0)))
      assert(rows.contains((0L, "buy", 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming admission filter counts pass/fail per source window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // clears x16's default thresholds: 22 words, 21 distinct, 2 stopwords
    val good = "the a " + (1 to 20).map(i => s"word$i").mkString(" ")
    val ms = MemoryStream[RDoc]
    val q = StreamDemos.admissionCounts(ms.toDF())
      .writeStream.format("memory").queryName("adm_out").outputMode("append").start()
    try {
      ms.addData(
        RDoc(ts(5), good, "web"), RDoc(ts(10), good, "web"),
        RDoc(ts(15), "tiny doc", "web"), RDoc(ts(20), good, "books"))
      q.processAllAvailable()
      ms.addData(RDoc(ts(200), good, "web")) // event time beyond hour 0 + watermark
      q.processAllAvailable()
      ms.addData(RDoc(ts(400), good, "web")) // second push finalizes hour 0
      q.processAllAvailable()
      val rows = spark.table("adm_out").collect()
        .filter(_.getAs[Timestamp]("hour_start").getTime == 0L)
        .map(r => (r.getAs[String]("source"), r.getAs[Boolean]("pass"), r.getAs[Long]("n")))
        .toSet
      assert(rows === Set(("web", true, 2L), ("web", false, 1L), ("books", true, 1L)))
    } finally q.stop()
  }

  test("streaming boilerplate scrub applies the batch-built d12 hot list statelessly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // hot list from a BATCH corpus: "a b c d" shared by two documents
    val corpus = Seq((1L, "a b c d e f g h"), (2L, "a b c d x y z w"))
      .toDF("doc_id", "text")
    val hot = graft.operators.Dedup.hotSegments(corpus, segWords = 4, minDf = 2L)
      .collect().map(_.getString(0)).toSeq
    assert(hot.length === 1)
    // live docs scrubbed map-side against the inlined hot set
    val ms = MemoryStream[RDoc]
    val q = StreamDemos.scrubBoilerplate(ms.toDF(), hot)
      .writeStream.format("memory").queryName("scrub_out").outputMode("append").start()
    try {
      ms.addData(
        RDoc(ts(1), "a b c d k l m n", "web"), // boilerplate prefix dropped
        RDoc(ts(2), "k l m n o p q r", "web"), // untouched
        RDoc(ts(3), "a b c d", "web"))         // fully boilerplate
      q.processAllAvailable()
      val rows = spark.table("scrub_out").collect()
        .map(r => r.getAs[String]("text") ->
          ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_dropped"), r.getAs[String]("clean_text"))))
        .toMap
      assert(rows("a b c d k l m n") === ((2L, 1L, "k l m n")))
      assert(rows("k l m n o p q r") === ((2L, 0L, "k l m n o p q r")))
      assert(rows("a b c d") === ((1L, 1L, "")))
      // stateless: no state store rows, nothing watermark-bounded
      assert(q.lastProgress == null ||
        Option(q.lastProgress.stateOperators).forall(_.isEmpty))
    } finally q.stop()
    // parity with the batch rewrite on the same corpus
    val batch = graft.operators.Dedup.segmentDedup(corpus, 4, 2L)
      .orderBy("doc_id").collect().map(_.getString(3))
    val streamed = StreamDemos.scrubBoilerplate(
        corpus.withColumnRenamed("doc_id", "id"), hot)
      .orderBy("id").collect().map(_.getAs[String]("clean_text"))
    assert(batch.toSeq === streamed.toSeq)
  }

  test("streaming BPE token counts match the batch encode rule-for-rule") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // rules trained on a BATCH corpus (pair counts need corpus-wide view)
    val corpus = Seq((1L, "abc abc abc abd"), (2L, "abc cab")).toDF("doc_id", "text")
    val rules = graft.operators.Bpe.learnedMerges(corpus, rounds = 2)
    assert(rules === Seq(("a", "b"), ("ab", "c"))) // (a,b)=6 then (ab,c)=4
    // live docs encoded map-side under the shipped rules — zero state
    val ms = MemoryStream[RDoc]
    val q = StreamDemos.bpeTokenCounts(ms.toDF(), rules)
      .writeStream.format("memory").queryName("bpe_out").outputMode("append").start()
    try {
      ms.addData(RDoc(ts(1), "abc abd cab", "web"))
      q.processAllAvailable()
      val r = spark.table("bpe_out").collect().head
      // abc->[abc]=1, abd->[ab,d]=2, cab->[c,ab]=2
      assert((r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens")) === ((3L, 5L)))
      assert(q.lastProgress == null ||
        Option(q.lastProgress.stateOperators).forall(_.isEmpty))
    } finally q.stop()
    // parity with the batch encode over the training corpus itself
    val batch = graft.operators.Bpe.encode(corpus, rounds = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    val streamed = StreamDemos.bpeTokenCounts(corpus, rules)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(batch.toSeq === streamed.toSeq)
  }

  test("streaming CMS cells match the batch sketch build") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[REv]
    val q = StreamDemos.cmsCells(ms.toDF(), depth = 2, width = 8)
      .writeStream.format("memory").queryName("cms_out").outputMode("append").start()
    try {
      val evs = (1 to 30).map(i => REv(i.toLong, ts(i.toLong), (i % 5).toLong, "e", 0.0))
      ms.addData(evs: _*)
      q.processAllAvailable()
      ms.addData(REv(98, ts(200), 0, "e", 0.0))
      q.processAllAvailable()
      ms.addData(REv(99, ts(400), 0, "e", 0.0))
      q.processAllAvailable()
      val cells = spark.table("cms_out").collect()
        .filter(_.getAs[Timestamp]("hour_start").getTime == 0L)
        .map(r => (r.getAs[Int]("h"), r.getAs[Long]("b")) -> r.getAs[Long]("c")).toMap
      // cell mass per hash row equals the window's event count
      assert(cells.filter(_._1._1 == 0).values.sum === 30L)
      assert(cells.filter(_._1._1 == 1).values.sum === 30L)
      // and the streaming build agrees cell-for-cell with the batch spelling
      val batch = evs.map(e => Tuple1(e.user_id)).toDF("user_id")
        .select(graft.operators.Curation.cmsProbe(col("user_id"), 2, 8).as("hb"))
        .groupBy(col("hb.h").as("h"), col("hb.b").as("b")).count()
        .collect().map(r => (r.getAs[Int]("h"), r.getAs[Long]("b")) -> r.getAs[Long]("count")).toMap
      assert(cells === batch)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[REv]
    val q = StreamDemos.sessionCounts(ms.toDF())
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      ms.addData(
        REv(1, ts(0), 1, "a", 0), REv(2, ts(10), 1, "a", 0), // one session
        REv(3, ts(100), 1, "a", 0))                          // second session
      q.processAllAvailable()
      ms.addData(REv(4, ts(500), 2, "a", 0)) // watermark push
      q.processAllAvailable()
      ms.addData(REv(5, ts(900), 2, "a", 0))
      q.processAllAvailable()
      val sessions = spark.table("sess_out").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Timestamp]("session_start").getTime / 60000, r.getAs[Long]("n_events"))).toSet
      assert(sessions === Set((0L, 2L), (100L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup drops same-id replays within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[REv]
    val q = StreamDemos.dedupByEventId(ms.toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      ms.addData(REv(1, ts(0), 1, "a", 0), REv(1, ts(1), 1, "a", 0), REv(2, ts(2), 1, "a", 0))
      q.processAllAvailable()
      ms.addData(REv(1, ts(3), 1, "a", 0), REv(3, ts(4), 1, "a", 0))
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replays and evicts expired keys") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[REv]
    val q = StreamDemos.dedupWithinWatermark(ms.toDF())
      .writeStream.format("memory").queryName("dedup_wm_out").outputMode("append").start()
    try {
      val B = 40000L
      ms.addData(REv(1, ts(B), 1, "a", 0), REv(1, ts(B + 1), 1, "a", 0)) // replay within window
      q.processAllAvailable()
      // advance the watermark far past id 1's eviction horizon…
      ms.addData(REv(2, ts(B + 600), 1, "a", 0))
      q.processAllAvailable()
      ms.addData(REv(3, ts(B + 1200), 1, "a", 0))
      q.processAllAvailable()
      // …then id 1 arrives again: its state was evicted, so it re-emits —
      // the bounded-replay contract (state is O(horizon), not O(keys))
      ms.addData(REv(1, ts(B + 1250), 1, "a", 0))
      q.processAllAvailable()
      val ids = spark.table("dedup_wm_out").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 1L, 2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join matches purchases to recent signups") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[REv]
    val q = StreamDemos.purchasesWithRecentSignup(ms.toDF())
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      val B = 20000L
      ms.addData(
        REv(1, ts(B), 1, "signup", 0),
        REv(2, ts(B + 30), 1, "purchase", 5.0),   // joined: signup 30 min before
        REv(3, ts(B + 200), 2, "purchase", 1.0),  // no signup → dropped (inner)
        REv(4, ts(B + 300), 1, "purchase", 2.0))  // signup 5h before → outside interval
      q.processAllAvailable()
      ms.addData(REv(5, ts(B + 1000), 3, "signup", 0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("ssj_out").collect()
        .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("s_id"))).toSet
      assert(rows === Set((2L, 1L)))
    } finally q.stop()
  }

  test("stream-stream as-of join picks the latest in-horizon signup (batch j8 parity)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val B = 30000L
    val fixture = Seq(
      REv(1, ts(B), 1, "signup", 0),
      REv(2, ts(B + 30), 1, "signup", 0),       // later signup — the as-of winner
      REv(3, ts(B + 40), 1, "purchase", 5.0),
      REv(4, ts(B + 50), 2, "purchase", 1.0),   // no signup → dropped (inner)
      REv(5, ts(B + 10), 3, "signup", 0),
      REv(6, ts(B + 100), 3, "purchase", 2.0))  // signup 90 min prior → outside horizon
    val ms = MemoryStream[REv]
    val q = StreamDemos.asOfRecentSignup(ms.toDF())
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    try {
      ms.addData(fixture: _*)
      q.processAllAvailable()
      // advance BOTH sides' watermarks past the purchases so the chained
      // join → aggregation finalizes (disjoint users: no join output)
      ms.addData(REv(7, ts(B + 1000), 8, "purchase", 0), REv(8, ts(B + 1000), 9, "signup", 0))
      q.processAllAvailable()
      ms.addData(REv(9, ts(B + 2000), 8, "purchase", 0), REv(10, ts(B + 2000), 9, "signup", 0))
      q.processAllAvailable()
      val got = spark.table("asof_out").collect()
        .filter(_.getAs[Long]("user_id") < 8L)
        .map(r => (r.getAs[Long]("p_id"), r.getAs[Timestamp]("asof_signup_ts").getTime / 60000))
        .toSet

      // batch j8 shape (window-function as-of) restricted to the same
      // 1-hour horizon, on the same fixture
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val expected = fixture.map(e => (e.event_id, e.ts, e.user_id, e.event_type))
        .toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("prior_signup_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" &&
          col("prior_signup_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
        .select(col("event_id"), col("prior_signup_ts"))
        .collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Timestamp]("prior_signup_ts").getTime / 60000))
        .toSet
      assert(expected === Set((3L, B + 30)))
      assert(got === expected)
    } finally q.stop()
  }

  test("streaming z-score matches batch w14 row-for-row across a batch boundary") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val all = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .collect()
      .map(r => StreamDemos.ZEv(r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .sortBy(e => (e.ts.getTime, e.event_id))
    // split at a time boundary so batch 2 is strictly later — state must
    // carry each user's trailing window across the micro-batch boundary
    val cut = all(all.length / 2).ts.getTime
    val (b1, b2) = all.partition(_.ts.getTime < cut)
    assert(b1.nonEmpty && b2.nonEmpty)
    val ms = MemoryStream[StreamDemos.ZEv]
    val q = StreamDemos.anomalyZscores(ms.toDS())
      .writeStream.format("memory").queryName("z_out").outputMode("append").start()
    try {
      ms.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      ms.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val got = spark.table("z_out").collect()
        .map(r => (r.getAs[Long]("event_id"),
          BigDecimal(r.getAs[Double]("mu")).setScale(9, BigDecimal.RoundingMode.HALF_UP),
          BigDecimal(r.getAs[Double]("z")).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
        .toSet
      val expected = SparkEntry.queries("w14_anomaly_zscore")(spark, d).collect()
        .map(r => (r.getAs[Long]("event_id"),
          BigDecimal(r.getAs[Double]("mu")).setScale(9, BigDecimal.RoundingMode.HALF_UP),
          BigDecimal(r.getAs[Double]("z")).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
        .toSet
      assert(expected.nonEmpty)
      assert(got === expected, "stream/batch z-score parity")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits sessions on gap or timeout") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = StreamDemos.sessionize(ms.toDS())
      .writeStream.format("memory").queryName("fmgws_out").outputMode("append").start()
    try {
      // base offset: an event exactly at the initial watermark (epoch 0)
      // would be dropped as late
      val B = 10000L
      ms.addData(Ev(1, ts(B), 1.0), Ev(1, ts(B + 5), 2.0), Ev(1, ts(B + 60), 3.0)) // gap closes first
      q.processAllAvailable()
      ms.addData(Ev(2, ts(B + 300), 0.0)) // watermark → times out user 1's open session
      q.processAllAvailable()
      ms.addData(Ev(2, ts(B + 600), 0.0))
      q.processAllAvailable()
      val sessions = spark.table("fmgws_out").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Timestamp]("session_start").getTime / 60000 - B, r.getAs[Int]("n_events"))).toSet
      assert(sessions === Set((0L, 2), (60L, 1)))
    } finally q.stop()
  }
}
