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

  test("x12 scrub output carries no digits outside placeholders") {
    val rows = SparkEntry.queries("x12_pii_scrub")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getString(2)
      assert(!scrubbed.matches(".*[0-9].*"), s"digits survived: $scrubbed")
    }
  }
}
