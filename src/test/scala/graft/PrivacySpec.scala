package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

/** Behavior tests for the privacy operators on adversarial fixtures the
  * synthetic corpus can't provide (it contains no emails or IPs — the
  * gate certifies cross-engine parity of the scrub chain, not that the
  * patterns actually catch PII).
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def scrubOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Privacy.scrub(col("t")).as("r")).head().getString(0)
  }

  test("scrub redacts emails, IPv4s, and digit runs") {
    assert(scrubOne("contact me at jane.doe+spam@mail.example.org today")
      === "contact me at <EMAIL> today")
    assert(scrubOne("server 10.0.42.255 port 8080")
      === "server <IP> port <NUM>")
    assert(scrubOne("card 4111111111111111 exp 12/26")
      === "card <NUM> exp <NUM>/<NUM>")
    // an email's digits are consumed by the email pass, not re-matched
    assert(scrubOne("a1b2@x99.co and 77") === "<EMAIL> and <NUM>")
    // the email pattern is case-insensitive: mixed-case PII is still PII
    assert(scrubOne("Reach Jane.Doe@Example.COM now") === "Reach <EMAIL> now")
    assert(scrubOne("SHOUTY@MAIL.ORG") === "<EMAIL>")
    // placeholders survive later passes untouched
    assert(scrubOne("u@v.io 1.2.3.4 5") === "<EMAIL> <IP> <NUM>")
    // no PII → identity
    assert(scrubOne("plain words only") === "plain words only")
  }

  test("pseudonyms are deterministic, salt-scoped, and identifier-distinct") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 1L).toDF("id")
      .select(Privacy.pseudonym("uid", col("id")).as("p1"),
        Privacy.pseudonym("other", col("id")).as("p2"))
      .collect()
    assert(ids(0).getString(0) === ids(2).getString(0)) // same id+salt → same
    assert(ids(0).getString(0) !== ids(1).getString(0)) // distinct ids differ
    assert(ids(0).getString(0) !== ids(0).getString(1)) // salts unlinkable
    assert(ids(0).getString(0).length === 16)
  }

  test("x13 k-anonymity: every surviving quasi-identifier group has >= k rows") {
    val rows = SparkEntry.queries("x13_k_anonymity")(spark, d).collect()
    assert(rows.nonEmpty)
    // recount groups from the output itself: group_n must be honest
    val byGroup = rows.groupBy(r => (r.getString(2), r.get(3)))
    byGroup.foreach { case (g, rs) =>
      assert(rs.length >= 3, s"group $g survived with ${rs.length} < k rows")
      rs.foreach(r => assert(r.getLong(4) === rs.length.toLong,
        s"group $g: group_n ${r.getLong(4)} != actual ${rs.length}"))
    }
    // raw user ids must not appear anywhere in the output
    val evCount = Tables.events(spark, d).count()
    assert(rows.length < evCount, "suppression dropped nothing — k too low to test")
    assert(rows.forall(_.getString(1).matches("[0-9a-f]{16}")))
  }

  test("per-class PII counts are staged: each class counts on post-earlier-pass text") {
    import spark.implicits._
    // 2 emails (one mixed-case, one carrying digits), 1 bare IP, 1 bare
    // number; the quad inside the second email's text and the emails'
    // digits must NOT inflate the later classes
    val df = Seq("a1b2@x99.co ping 10.0.0.1 from Jane.Doe@EXAMPLE.com port 8080").toDF("props")
    val r = df.select(
      regexp_count(col("props"), lit(Privacy.EmailRe)).cast("long").as("n_emails"),
      regexp_count(regexp_replace(col("props"), Privacy.EmailRe, "<EMAIL>"),
        lit(Privacy.Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(Privacy.scrubEmailIp(col("props")), lit(Privacy.NumRe))
        .cast("long").as("n_nums")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 1L)))
  }

  test("oracle SQL helpers escape quotes in the salt") {
    assert(Privacy.pseudonymSql("o'brien", "id").contains("o''brien"))
  }

  test("x13 output row key is pseudonymized, not the raw event_id") {
    val df = SparkEntry.queries("x13_k_anonymity")(spark, d)
    assert(df.columns.head === "event_pseudonym")
    assert(df.select("event_pseudonym").head().getString(0).matches("[0-9a-f]{16}"))
  }

  test("x34 l-diversity: every surviving group has >= l distinct sensitives") {
    val rows = SparkEntry.queries("x34_l_diversity")(spark, d).collect()
    assert(rows.nonEmpty)
    // per surviving (event_type, hour) group: the reported n_sensitive
    // bound holds AND is consistent with the actual distinct pseudonyms
    // in the output (the pseudonym is injective on user_id at this size)
    rows.groupBy(r => (r.getString(2), r.get(3))).foreach { case (g, rs) =>
      val reported = rs.map(_.getLong(5)).toSet
      assert(reported.size === 1, s"group $g inconsistent n_sensitive")
      assert(reported.head >= 3, s"group $g below l")
      val distinctUsers = rs.map(_.getString(1)).toSet.size
      assert(distinctUsers.toLong === reported.head,
        s"group $g: reported ${reported.head} != observed $distinctUsers")
      assert(rs.size >= 3, s"group $g below k")
    }
    // l-diversity is strictly stronger than k-anonymity here: it must
    // never keep a row x13 suppressed
    val kept13 = SparkEntry.queries("x13_k_anonymity")(spark, d)
      .select("event_pseudonym").collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(kept13(r.getString(0)),
      s"x34 kept a row x13 suppressed: ${r.getString(0)}"))
  }

  test("x12 scrub output carries no digits outside placeholders") {
    val rows = SparkEntry.queries("x12_pii_scrub")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getString(2)
      assert(!scrubbed.matches(".*[0-9].*"), s"digits survived: $scrubbed")
    }
  }

  test("x40 DP release: non-negative, noise actually perturbs, Laplace tail bounded") {
    import org.apache.spark.sql.functions._
    val released = SparkEntry.queries("x40_dp_release")(spark, d).collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)), r.getLong(2))).toMap
    val truth = graft.Tables.events(spark, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .count().collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)), r.getLong(2))).toMap
    assert(released.keySet === truth.keySet, "release covers every group exactly once")
    val devs = released.map { case (k, rel) =>
      assert(rel >= 0L, s"group $k released negative count $rel")
      math.abs(rel - truth(k))
    }
    assert(devs.exists(_ > 0L), "the mechanism must actually perturb some counts")
    // b = 1: P(|noise| > 23) = e^-23 ~ 1e-10; the seeded uniform has 32
    // bits so the draw cannot exceed -ln(2^-33) ~ 22.9 by construction
    devs.foreach(dv => assert(dv <= 25L, s"deviation $dv outside the Laplace tail bound"))
  }

  test("x42 DP sum: clamp binds before noise; Laplace tail bounded; mean is post-processing") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("x42_dp_sum_release")(spark, d).collect()
    assert(rows.nonEmpty)
    // truth recomputed both ways: the released sum must track the
    // CLAMPED truth (|dev| ≤ b·23 — the 32-bit seeded uniform cannot
    // draw past -ln(2^-33), so b = 100 bounds |noise| ≈ 2287), and the
    // clamp must actually bind on this data (unclamped ≠ clamped), or
    // the test would pass with the clamp deleted.
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val pu = graft.Tables.events(spark, d)
      .withColumn("day", date_trunc("day", col("ts")))
      .groupBy("event_type", "day", "user_id")
      .agg(sum(round(col("value"), 9).cast(dec)).as("contrib"))
    val truth = pu
      .groupBy("event_type", "day")
      .agg(sum(least(greatest(col("contrib"), lit(0).cast(dec)),
          lit(50.0).cast(dec))).as("cl"),
        sum(col("contrib")).as("raw"), count(lit(1)).as("users"))
      .collect()
      .map(r => ((r.getString(0), r.getTimestamp(1)),
        (r.getDecimal(2).doubleValue(), r.getDecimal(3).doubleValue(),
          r.getLong(4)))).toMap
    assert(truth.values.exists { case (cl, raw, _) => cl < raw },
      "the per-user clamp must bind somewhere on this data")
    rows.foreach { r =>
      val k = (r.getString(0), r.getTimestamp(1))
      val (cl, _, users) = truth(k)
      val relSum = r.getLong(2); val relUsers = r.getLong(3)
      assert(relSum >= 0L && relUsers >= 1L)
      assert(math.abs(relSum - cl) <= 2300.0,
        s"group $k: released $relSum vs clamped truth $cl outside Laplace(100) tail")
      assert(math.abs(relUsers - users) <= 50L,
        s"group $k: released users $relUsers vs $users outside Laplace(2) tail")
      // mean is derived from the released pair only
      assert(r.getDouble(4) ===
        BigDecimal(relSum.toDouble / relUsers.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(rows.map(r => math.abs(r.getLong(2) -
        math.rint(truth((r.getString(0), r.getTimestamp(1)))._1))).exists(_ > 0),
      "the mechanism must actually perturb some sums")
  }

  test("DP releases default to CSPRNG-salted seeds; the oracle spelling is opt-in") {
    // Production default (`seeded = false`) mixes a fresh driver-drawn
    // salt into every seed, so two releases over the SAME data must
    // disagree somewhere (Laplace(100) on the sums — the chance that
    // two independent salted draws integerize identically across every
    // group is negligible), while the seeded spelling is bit-stable.
    // This is the r14-advice gate: the publicly-recomputable
    // deterministic release cannot be what a caller ships by accident.
    val ev = graft.Tables.events(spark, d)
    def sums(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0) + "|" + r.getTimestamp(1), r.getLong(2))).toSeq
    val a = sums(Privacy.dpSumMeanRelease(ev))
    val b = sums(Privacy.dpSumMeanRelease(ev))
    val s1 = sums(Privacy.dpSumMeanRelease(ev, seeded = true))
    val s2 = sums(Privacy.dpSumMeanRelease(ev, seeded = true))
    assert(s1 === s2, "seeded releases must be bit-stable (the gate relies on it)")
    assert(a !== b, "two default releases must draw different salts")
    assert(a !== s1, "the default release must not equal the public-seed spelling")
  }

  test("x43 exponential-mechanism release: one category per day, vocabulary candidates, deterministic when seeded") {
    val rel = SparkEntry.queries("x43_dp_argmax_release")(spark, d).collect()
    val days = rel.map(_.getTimestamp(0))
    assert(days.length === days.distinct.length, "exactly one release per day")
    // candidates are the FULL event-type vocabulary per day (r15 advice:
    // per-day observed candidates would make candidacy itself leak) —
    // the winner must be a vocabulary member, NOT necessarily observed
    // that day
    val vocab = graft.Tables.events(spark, d)
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    val allDays = graft.Tables.events(spark, d)
      .select(date_trunc("day", col("ts")).as("day")).distinct()
      .collect().map(_.getTimestamp(0)).toSet
    assert(days.toSet === allDays, "one release for EVERY day in the corpus")
    rel.foreach { r =>
      assert(vocab(r.getString(1)),
        "released category must come from the event-type vocabulary")
      assert(r.getDouble(2) === 1.0)
    }
    val again = SparkEntry.queries("x43_dp_argmax_release")(spark, d).collect()
    assert(rel.map(_.toString).toSeq === again.map(_.toString).toSeq,
      "the seeded gate spelling must be bit-stable")
  }

  test("x43 candidate set is data-independent: a zero-count category can win") {
    import spark.implicits._
    import java.sql.Timestamp
    // day 1 observes every type; day 2 observes ONLY 'alpha', once. Under
    // the old observed-candidates spelling day 2 could only ever release
    // 'alpha'; with the dense vocabulary grid the unobserved types
    // compete at count 0, and with utilities this close (0.5 apart) the
    // seeded Gumbel decides — verified below to pick an UNOBSERVED type,
    // which is exactly the behavior the ε=1 claim needs (candidacy must
    // not depend on one record's presence).
    val day1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val day2 = Timestamp.valueOf("2024-01-02 00:00:00")
    val types = Seq("alpha", "beta", "gamma", "delta")
    val rows = types.map(t => (day1, t)) :+ ((day2, "alpha"))
    val ev = rows.toDF("ts", "event_type")
      .withColumn("event_id", monotonically_increasing_id())
    val rel = Privacy.dpArgmaxRelease(ev, seeded = true).collect()
      .map(r => (r.getTimestamp(0), r.getString(1))).toMap
    assert(rel.keySet === Set(day1, day2))
    assert(types.contains(rel(day2)), "winner still from the vocabulary")
    assert(rel(day2) !== "alpha",
      "with near-tied utilities the seeded Gumbel must be able to pick a " +
        "zero-count candidate — if this ever releases 'alpha', check that " +
        "the candidate grid is still dense (observed-only candidates would " +
        "make this assertion IMPOSSIBLE to fail the other way)")
  }

  test("x47 continual release: dense public grid, tree-mechanism error bound, seeded-stable") {
    val rel = SparkEntry.queries("x47_dp_continual")(spark, d).collect()
    assert(rel.length === 64, "one release per public slot, empty days included")
    assert(rel.map(_.getLong(1)).toSeq === (1L to 64L), "dense day indexes")
    // true running count per grid slot (slots past the data's last day
    // hold the final total)
    val daily = graft.Tables.events(spark, d)
      .select(datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("d0"))
      .filter(col("d0") >= 0 && col("d0") < 64)
      .groupBy("d0").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val trueCum = (0 until 64).scanLeft(0L)((acc, i) => acc + daily.getOrElse(i, 0L)).drop(1)
    // each release sums ≤ 7 noisy nodes; the 32-bit seeded uniform
    // bounds one |Laplace(7)| draw by 7·ln(2^32) ≈ 155.3 → prefix
    // error < 1088 for ANY seed. Fails if the decomposition double-
    // counts a node, misses one, or the noise scale is off by a level.
    rel.foreach { r =>
      val t = r.getLong(1).toInt
      assert(math.abs(r.getLong(2) - trueCum(t - 1)) < 1088.0,
        s"slot $t: released ${r.getLong(2)} vs true ${trueCum(t - 1)} " +
          "outside the tree-mechanism bound")
    }
    // monotone TRUE cum + bounded noise means the released tail must
    // end within the bound of the corpus total (a prefix/suffix swap
    // or an off-by-one block index would break this)
    assert(math.abs(rel.last.getLong(2) - trueCum.last) < 1088.0)
    val again = SparkEntry.queries("x47_dp_continual")(spark, d).collect()
    assert(rel.map(_.toString).toSeq === again.map(_.toString).toSeq,
      "the seeded gate spelling must be bit-stable")
  }

  test("x46 budget ledger: exact cumulative spend, admission flips once, refusal throws") {
    import spark.implicits._
    // ledger semantics on a hand-built registry: 0.25 × 4 dailies + two
    // ε=1 ad-hoc against budget 2.0 → the first five admit (cum 2.0
    // exactly — the boundary release is admitted, ≤ not <), the sixth
    // refuses
    val reg = Seq(
      (1L, "d1", "laplace_count", 0.25), (2L, "d2", "laplace_count", 0.25),
      (3L, "d3", "laplace_count", 0.25), (4L, "d4", "laplace_count", 0.25),
      (5L, "adhoc1", "exp_argmax", 1.0), (6L, "adhoc2", "exp_median", 1.0))
      .toDF("seq", "release_id", "mechanism", "epsilon")
    val led = Privacy.dpBudgetLedger(reg, budget = 2.0)
      .orderBy("seq").collect()
    assert(led.map(_.getDouble(4)).toSeq ===
      Seq(0.25, 0.5, 0.75, 1.0, 2.0, 3.0), "exact cumulative epsilon")
    assert(led.map(_.getBoolean(5)).toSeq ===
      Seq(true, true, true, true, true, false),
      "boundary release admitted (cum == budget), overdraw refused")
    // admission is monotone: once false, never true again
    assert(!led.map(_.getBoolean(5)).dropWhile(identity).contains(true))
    // the refusal primitive: inside budget returns the new spend,
    // overdraw throws BEFORE anything is released
    val admitted = Privacy.dpBudgetAdmit(reg.filter(col("seq") <= 4),
      budget = BigDecimal(2), proposedEps = BigDecimal(1))
    assert(admitted === BigDecimal(2))
    val ex = intercept[IllegalStateException] {
      Privacy.dpBudgetAdmit(reg, budget = BigDecimal(2),
        proposedEps = BigDecimal("0.000001"))
    }
    assert(ex.getMessage.contains("refused"))
    intercept[IllegalArgumentException] {
      Privacy.dpBudgetAdmit(reg, budget = BigDecimal(10), proposedEps = BigDecimal(0))
    }
  }

  test("x44 DP median: one release per type, inside the public range, near the true median, seeded-stable") {
    val rel = SparkEntry.queries("x44_dp_median_release")(spark, d).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val truth = graft.Tables.events(spark, d)
      .groupBy("event_type").agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rel.keySet === truth.keySet, "one release per event_type")
    rel.foreach { case (t, m) =>
      assert(m > 0.0 && m < 512.0, s"$t: released $m outside the public range")
      // the Gumbel's reachable max is ~20.7 (32-bit seeded uniform), and
      // displacing the winner k bins costs half the record mass between
      // — at >=100 records/type a 100-unit displacement needs a >50
      // utility deficit the noise cannot pay, so this bound is safe for
      // any seed while still failing if the binning/utility were wrong
      assert(math.abs(m - truth(t)) < 100.0,
        s"$t: released $m implausibly far from true median ${truth(t)}")
    }
    val again = SparkEntry.queries("x44_dp_median_release")(spark, d).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rel === again, "the seeded gate spelling must be bit-stable")
  }
}
