package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dataset-level invariants of the text-pipeline operators at sf0.001 —
  * properties the oracle hash can't state directly (it certifies equality
  * with DuckDB, not that both engines compute something sensible).
  */
class InvariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("x8 packing: offsets bounded, per-shard prefix sums consistent") {
    val rows = SparkEntry.queries("x8_sequence_pack")(spark, d).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(0), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // (lang, shard, doc_id, n_tokens, cum_before, chunk_id, offset)
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, id, _, cum, chunk, off) =>
      assert(off >= 0 && off < 512, s"doc $id offset $off")
      assert(chunk === cum / 512, s"doc $id chunk/cum mismatch")
      assert(off === cum % 512)
    }
    // cum_before is the exact running sum of prior docs' tokens per shard
    rows.groupBy(r => (r._1, r._2)).foreach { case (shard, rs) =>
      var running = 0L
      rs.sortBy(_._3).foreach { case (_, _, id, n, cum, _, _) =>
        assert(cum === running, s"shard $shard doc $id: cum $cum != $running")
        running += n
      }
    }
  }

  test("x9 repetition: ratios bounded, distinct <= total") {
    val rows = SparkEntry.queries("x9_repetition")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, distinct) = (r.getLong(1), r.getLong(2))
      val (dr, tf, df) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(distinct >= 1 && distinct <= n)
      assert(dr > 0 && dr <= 1.0)
      assert(tf > 0 && tf <= 1.0)
      assert(df >= 0 && df <= 1.0)
    }
  }

  test("x10 unigram LM: log-probs negative, fluency consistent with threshold") {
    val rows = SparkEntry.queries("x10_unigram_lm")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lp, fluent) = (r.getDouble(2), r.getBoolean(3))
      assert(lp < 0, s"avg ln p must be negative, got $lp")
      assert(fluent === (lp > -7.0))
    }
  }

  test("x11 pipeline: survivors pass the quality bar and pack consistently") {
    val rows = SparkEntry.queries("x11_pipeline")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.35) // quality_score
      val (cum, chunk, off) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(chunk === cum / 512 && off === cum % 512)
    }
    // packing re-derives over the FILTERED survivor set, not the corpus:
    // per shard, cum_before of the k-th survivor = sum of prior survivors
    rows.groupBy(r => (r.getString(1), r.getLong(4))).foreach { case (_, rs) =>
      var running = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(5) === running)
        running += r.getLong(2) // n_tokens
      }
    }
  }
}
