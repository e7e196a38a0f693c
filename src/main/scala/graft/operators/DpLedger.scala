package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent charge-then-release DP budget registry — the enforcement
  * layer that makes [[Privacy.dpBudgetLedger]]'s accounting BINDING on
  * the release family (r16 verdict #3: the ledger existed as a primitive
  * plus a gate query over a synthetic registry, but every release
  * function hard-coded ε and none consulted it — budget enforcement a
  * release can bypass is audit theater). Every `Privacy.dp*Release`
  * entry point now takes an optional ledger and, when present, charges
  * its window ε here BEFORE constructing the release plan: a refused
  * release throws out of the release function itself, so no output
  * frame exists, no action can run, and nothing is written anywhere —
  * charge-then-release exactly as [[Privacy.dpBudgetAdmit]]'s contract
  * prescribes (a crash after the charge wastes budget, which is safe;
  * release-then-charge could release past budget, which is not).
  *
  * Durability/scale shape: the registry is a driver-local, fsync'd
  * append-only TSV under `dir` — deliberately NOT a distributed store.
  * A ledger is release-count-sized by construction (one row per release
  * ever made against the corpus — thousands at most, never
  * corpus-shaped), and budget accounting MUST be serialized anyway: two
  * concurrent releases that each check the budget independently can
  * both admit past it (the same rationale as the x46 gate's
  * un-partitioned window). One writer, ordered appends, fsync per
  * charge = the honest plan at any corpus scale; a multi-driver
  * deployment must put `dir` on shared storage behind a single writer
  * (external coordination, out of scope here). Loaded charges are kept
  * in memory (ledger-sized), so admit checks cost no I/O and no Spark
  * job; ε values serialize as plain decimal STRINGS so a reloaded
  * ledger's accounting is exactly the BigDecimal arithmetic that wrote
  * it — no float round-trip can drift the admit verdict.
  *
  * The registry file carries release ids, mechanisms, and ε values —
  * ship it as audit evidence only if the SCHEDULE is public (the x46
  * gate's schedule rides the fixed 64-day calendar grid for exactly
  * this reason; a schedule derived from observed data is as sensitive
  * as the raw release set — r16 advice).
  */
final class DpLedger private (val dir: String, val budget: BigDecimal) {
  private val file = new java.io.File(dir, "registry.tsv")
  // (seq, release_id, mechanism, epsilon) in charge order; append-only
  private var charges: Vector[(Long, String, String, BigDecimal)] =
    if (!file.exists()) Vector.empty
    else {
      val src = scala.io.Source.fromFile(file, "UTF-8")
      try src.getLines().filter(_.nonEmpty).map { line =>
        line.split("\t", -1) match {
          case Array(seq, id, mech, eps) =>
            (seq.toLong, id, mech, BigDecimal(eps))
          case _ => sys.error(s"corrupt ledger line in $file: '$line'")
        }
      }.toVector
      finally src.close()
    }
  private var spentV: BigDecimal = charges.map(_._4).sum

  /** Exact cumulative ε of every ADMITTED charge (refusals spend nothing). */
  def spent: BigDecimal = synchronized(spentV)

  def remaining: BigDecimal = synchronized(budget - spentV)

  /** Charge `eps` against the budget: true = admitted (row durably
    * appended, spend updated), false = refused (nothing written, spend
    * unchanged — a LATER, smaller proposal may still be admitted; the
    * x46 gate's schedule is one where refusal happens to be monotone
    * because spend plateaus exactly at the budget, and the oracle's
    * cum ≤ budget spelling verifies that identity per run).
    */
  def tryCharge(releaseId: String, mechanism: String, eps: BigDecimal): Boolean =
    synchronized {
      require(eps > 0, s"a release must spend positive epsilon, got $eps")
      require(!releaseId.contains("\t") && !releaseId.contains("\n") &&
        !mechanism.contains("\t") && !mechanism.contains("\n"),
        "release_id/mechanism must not contain tab or newline (TSV registry)")
      if (spentV + eps > budget) false
      else {
        val seq = charges.length + 1L
        val line = s"$seq\t$releaseId\t$mechanism\t${eps.underlying.toPlainString}\n"
        val out = new java.io.FileOutputStream(file, true)
        try { out.write(line.getBytes("UTF-8")); out.getFD.sync() }
        finally out.close()
        charges = charges :+ ((seq, releaseId, mechanism, eps))
        spentV += eps
        true
      }
    }

  /** [[tryCharge]] that THROWS on refusal — the spelling the release
    * functions call, so a refused release never returns a frame.
    * Returns the new cumulative spend on admit. The refusal is a TYPED
    * exception ([[DpLedger.BudgetRefused]], r17 review) so callers that
    * translate it — the HTTP facade's 429 — match on type, not on a
    * message prefix a rewording would silently break.
    */
  def charge(releaseId: String, mechanism: String, eps: BigDecimal): BigDecimal =
    synchronized {
      if (!tryCharge(releaseId, mechanism, eps))
        throw new DpLedger.BudgetRefused(
          s"DP budget exhausted: spent=$spentV + proposed=$eps exceeds " +
            s"budget=$budget — release '$releaseId' refused")
      spentV
    }

  /** Charge-then-release wrapper: `mk` (by-name) is evaluated ONLY after
    * the charge is admitted — on refusal the mechanism never runs.
    */
  def release[A](releaseId: String, mechanism: String, eps: BigDecimal)(mk: => A): A = {
    charge(releaseId, mechanism, eps)
    mk
  }

  /** The registry as a frame in [[Privacy.dpBudgetLedger]]'s input
    * schema (seq, release_id, mechanism, epsilon) — feed it there for
    * the annotated cumulative view.
    */
  def registry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized(charges).map { case (seq, id, mech, eps) =>
      (seq, id, mech, eps.toDouble)
    }.toDF("seq", "release_id", "mechanism", "epsilon")
  }
}

object DpLedger {
  /** Thrown by [[DpLedger.charge]] on a budget refusal. Subclasses
    * IllegalStateException so existing catch sites keep working; the
    * message carries only PUBLIC schedule state (spent/proposed/
    * budget/release id), never data.
    */
  final class BudgetRefused(msg: String) extends IllegalStateException(msg)

  /** Open (or create) the ledger at `dir` with the given total budget.
    * Reopening an existing directory resumes its accounting exactly.
    */
  def open(dir: String, budget: BigDecimal): DpLedger = {
    val d = new java.io.File(dir)
    if (!d.exists()) require(d.mkdirs(), s"cannot create ledger dir $dir")
    new DpLedger(dir, budget)
  }
}
