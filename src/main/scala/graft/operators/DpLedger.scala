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
  * CURRENCY (r17 verdict #2): a ledger accounts exactly one privacy
  * currency — pure-ε (Laplace/exponential releases) or zCDP-ρ
  * (Gaussian, x50) — declared at [[DpLedger.open]] and recorded on
  * every registry row. ε and ρ are incomparable numbers (ρ = 0.125
  * corresponds to ε ≈ 2.75 at δ = 1e−6 via [[Privacy.zcdpEpsilon]]);
  * summing them in one registry is a silent ~8× under-accounting unit
  * error. What was a scaladoc-only warning is now enforced: a charge
  * whose currency differs from the ledger's throws
  * `IllegalArgumentException` (a caller bug, distinct from the typed
  * budget refusal), and reopening a directory under a different
  * currency than its rows were written in fails loudly at load.
  * Legacy 4-column registries (written before the currency column)
  * load as ε-currency — every pre-currency charge site was an ε
  * release, so the migration is exact, and the rows are rewritten in
  * the current 6-column schema on the next admitted charge's append
  * (append only; old lines stay valid).
  *
  * δ IS METERED, NOT DOCUMENTED (r18 verdict #1): the (ε, δ)
  * mechanisms — the stability histograms x54/x55, whose data-dependent
  * release set is LICENSED by δ — compose sequentially as (Kε, Kδ),
  * and until round 19 the δ side was scaladoc guidance ("the reader
  * composes δs alongside") with no charge, no budget, no refusal — the
  * exact shape of r17's currency gap. Every charge now carries a δ
  * (0 for pure-ε/ρ rows, which is what every legacy line loads as),
  * the registry records it per row, [[DpLedger.open]] takes a
  * `deltaBudget` (default 0: a ledger that never granted δ refuses
  * the first (ε, δ>0) charge instead of silently accumulating), and a
  * proposal is refused when EITHER coordinate would overdraw — the
  * refusal message names the binding constraint. δ values are decimal
  * strings like ε, so K stability releases spend exactly (K·ε, K·δ)
  * in reloadable exact arithmetic (PropertySpec extends the budget
  * invariant to the pair). δ is currency-orthogonal: an (ε, δ) row in
  * an ε ledger and a (ρ, δ) row in a ρ ledger both make sense (zCDP's
  * δ appears only at [[Privacy.zcdpEpsilon]] READ time, so ρ-ledger
  * rows normally carry δ = 0).
  *
  * SINGLE WRITER, NOW A TRIPWIRE (r17 verdict #3): serialized budget
  * accounting was a documented premise — two instances that each load
  * the file once and append independently can BOTH admit past budget
  * with no error. [[DpLedger.open]] now takes an OS file lock
  * (`FileChannel.tryLock` on `registry.lock`) held for the instance
  * lifetime: a second open on the same directory — another process, or
  * another instance in this JVM — fails loudly instead of silently
  * un-serializing the accounting. [[close]] releases the lock (and is
  * what a reopen-in-process test must call first); locks also release
  * on process exit, so a crashed driver never wedges the directory.
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
  * (external coordination, out of scope here — the lock makes a
  * violated premise fail loudly on POSIX-advisory-lock filesystems,
  * it does not coordinate). Loaded charges are kept in memory
  * (ledger-sized), so admit checks cost no I/O and no Spark job; ε
  * values serialize as plain decimal STRINGS so a reloaded ledger's
  * accounting is exactly the BigDecimal arithmetic that wrote it — no
  * float round-trip can drift the admit verdict.
  *
  * The registry file carries release ids, mechanisms, currencies, and
  * values — ship it as audit evidence only if the SCHEDULE is public
  * (the x46 gate's schedule rides the fixed 64-day calendar grid for
  * exactly this reason; a schedule derived from observed data is as
  * sensitive as the raw release set — r16 advice).
  */
final class DpLedger private (val dir: String, val budget: BigDecimal,
    val currency: String, val deltaBudget: BigDecimal) {
  private val file = new java.io.File(dir, "registry.tsv")

  // single-writer tripwire: an exclusive OS lock on dir/registry.lock,
  // held until close() or process exit. Taken BEFORE the registry is
  // read, so no instance can load a snapshot another writer is
  // appending to. ANY acquisition failure closes the RAF before
  // rethrowing (r18 advice: tryLock on a filesystem without lock
  // support throws IOException, and the bare rethrow leaked the file
  // handle).
  private val lockRaf =
    new java.io.RandomAccessFile(new java.io.File(dir, "registry.lock"), "rw")
  private val lock: java.nio.channels.FileLock = {
    val l =
      try lockRaf.getChannel.tryLock()
      catch {
        case _: java.nio.channels.OverlappingFileLockException => null
        case e: Throwable => lockRaf.close(); throw e
      }
    if (l == null) {
      lockRaf.close()
      throw new IllegalStateException(
        s"ledger directory $dir is already open by another DpLedger instance " +
          "(budget accounting must have exactly one writer); close() the " +
          "other instance first")
    }
    l
  }
  @volatile private var closed = false

  // (seq, release_id, mechanism, value, currency, delta) in charge
  // order; append-only. 4-column legacy lines load as epsilon-currency;
  // pre-δ 4/5-column lines load as δ = 0 (every pre-δ charge site was a
  // pure-ε or pure-ρ release, so the migration is exact). The load runs
  // AFTER the lock is taken, so a parse failure must release it on the
  // way out (r18 review: a corrupt line would otherwise wedge the
  // directory for the rest of the JVM — every later open, including one
  // after the file is repaired, would read "already open").
  private var charges: Vector[(Long, String, String, BigDecimal, String, BigDecimal)] =
    if (!file.exists()) Vector.empty
    else try {
      val src = scala.io.Source.fromFile(file, "UTF-8")
      try src.getLines().filter(_.nonEmpty).map { line =>
        line.split("\t", -1) match {
          case Array(seq, id, mech, v) =>
            (seq.toLong, id, mech, BigDecimal(v), DpLedger.Epsilon, BigDecimal(0))
          case Array(seq, id, mech, v, cur) =>
            (seq.toLong, id, mech, BigDecimal(v), cur, BigDecimal(0))
          case Array(seq, id, mech, v, cur, dlt) =>
            (seq.toLong, id, mech, BigDecimal(v), cur, BigDecimal(dlt))
          case _ => sys.error(s"corrupt ledger line in $file: '$line'")
        }
      }.toVector
      finally src.close()
    } catch { case e: Throwable => close(); throw e }
  charges.find(_._5 != currency).foreach { bad =>
    val other = bad._5
    close()
    throw new IllegalStateException(
      s"ledger at $dir holds $other-currency charges (e.g. release " +
        s"'${bad._2}') and cannot be opened as a $currency ledger — " +
        "ε and ρ must never share a registry")
  }
  private var spentV: BigDecimal = charges.map(_._4).sum
  private var spentDeltaV: BigDecimal = charges.map(_._6).sum

  /** Exact cumulative spend of every ADMITTED charge (refusals spend
    * nothing), in the ledger's [[currency]].
    */
  def spent: BigDecimal = synchronized(spentV)

  def remaining: BigDecimal = synchronized(budget - spentV)

  /** Exact cumulative δ of every admitted charge (refusals spend
    * nothing) — the second coordinate of the (ε, δ) pair.
    */
  def spentDelta: BigDecimal = synchronized(spentDeltaV)

  def remainingDelta: BigDecimal = synchronized(deltaBudget - spentDeltaV)

  /** Charge the (`value` in `chargeCurrency`, `delta`) pair against
    * the two budgets: true = admitted (row durably appended, both
    * spends updated), false = refused because EITHER coordinate would
    * overdraw (nothing written, spend unchanged — a LATER, smaller
    * proposal may still be admitted; the x46 gate's schedule is one
    * where refusal happens to be monotone because spend plateaus
    * exactly at the budget, and the oracle's cum ≤ budget spelling
    * verifies that identity per run). A currency mismatch or a
    * negative δ is a CALLER BUG, not a refusal: it throws
    * `IllegalArgumentException` before anything is checked or written.
    */
  def tryCharge(releaseId: String, mechanism: String, value: BigDecimal,
      chargeCurrency: String = DpLedger.Epsilon,
      delta: BigDecimal = BigDecimal(0)): Boolean =
    synchronized {
      require(!closed, s"ledger at $dir is closed")
      require(chargeCurrency == currency,
        s"cannot charge $chargeCurrency into a $currency ledger ($dir): " +
          "ε and ρ are incomparable — open a separate ledger per currency")
      require(value > 0, s"a release must spend a positive amount, got $value")
      require(delta >= 0, s"delta must be non-negative, got $delta")
      require(!releaseId.contains("\t") && !releaseId.contains("\n") &&
        !mechanism.contains("\t") && !mechanism.contains("\n"),
        "release_id/mechanism must not contain tab or newline (TSV registry)")
      if (spentV + value > budget || spentDeltaV + delta > deltaBudget) false
      else {
        val seq = charges.length + 1L
        val line = s"$seq\t$releaseId\t$mechanism\t" +
          s"${value.underlying.toPlainString}\t$currency\t" +
          s"${delta.underlying.toPlainString}\n"
        val out = new java.io.FileOutputStream(file, true)
        try { out.write(line.getBytes("UTF-8")); out.getFD.sync() }
        finally out.close()
        charges = charges :+ ((seq, releaseId, mechanism, value, currency, delta))
        spentV += value
        spentDeltaV += delta
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
  def charge(releaseId: String, mechanism: String, value: BigDecimal,
      chargeCurrency: String = DpLedger.Epsilon,
      delta: BigDecimal = BigDecimal(0)): BigDecimal =
    synchronized {
      if (!tryCharge(releaseId, mechanism, value, chargeCurrency, delta)) {
        // name the BINDING constraint: an operator staring at a refusal
        // needs to know which budget to renegotiate (the ε message
        // unchanged for pure-ε proposals, so existing consumers of the
        // refusal line keep reading the same shape)
        val epsBinds = spentV + value > budget
        val msg =
          if (epsBinds)
            s"DP budget exhausted: spent=$spentV + proposed=$value exceeds " +
              s"budget=$budget $currency — release '$releaseId' refused"
          else
            s"DP delta budget exhausted: spent_delta=$spentDeltaV + " +
              s"proposed_delta=$delta exceeds delta_budget=$deltaBudget — " +
              s"release '$releaseId' refused"
        throw new DpLedger.BudgetRefused(msg)
      }
      spentV
    }

  /** Charge-then-release wrapper: `mk` (by-name) is evaluated ONLY after
    * the charge is admitted — on refusal the mechanism never runs.
    */
  def release[A](releaseId: String, mechanism: String, value: BigDecimal,
      chargeCurrency: String = DpLedger.Epsilon,
      delta: BigDecimal = BigDecimal(0))(mk: => A): A = {
    charge(releaseId, mechanism, value, chargeCurrency, delta)
    mk
  }

  /** Release the single-writer lock. After close the instance refuses
    * further charges; the directory can then be reopened (resuming the
    * accounting exactly). Idempotent.
    */
  def close(): Unit = synchronized {
    if (!closed) {
      closed = true
      try lock.release() finally lockRaf.close()
    }
  }

  /** The registry as a frame in [[Privacy.dpBudgetLedger]]'s input
    * schema (seq, release_id, mechanism, epsilon) plus the currency
    * and delta columns — feed it there for the annotated cumulative
    * view.
    */
  def registry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized(charges).map { case (seq, id, mech, v, cur, dlt) =>
      (seq, id, mech, v.toDouble, cur, dlt.toDouble)
    }.toDF("seq", "release_id", "mechanism", "epsilon", "currency", "delta")
  }
}

object DpLedger {
  /** Pure-ε currency (Laplace, exponential-mechanism releases). */
  val Epsilon = "epsilon"

  /** zCDP-ρ currency (Gaussian releases, x50) — convert the SUMMED ρ
    * once at read time via [[Privacy.zcdpEpsilon]], never per release.
    */
  val Rho = "rho"

  /** Thrown by [[DpLedger.charge]] on a budget refusal. Subclasses
    * IllegalStateException so existing catch sites keep working; the
    * message carries only PUBLIC schedule state (spent/proposed/
    * budget/release id), never data.
    */
  final class BudgetRefused(msg: String) extends IllegalStateException(msg)

  /** Open (or create) the ledger at `dir` with the given total budget
    * in `currency` and total δ budget (default 0: a ledger that never
    * granted δ refuses the first δ-spending charge — (ε, δ) mechanisms
    * like the stability histograms need an explicit `deltaBudget`).
    * Reopening an existing directory resumes both accountings exactly —
    * and fails loudly if its rows were written in a different currency,
    * or if another instance holds it open.
    */
  def open(dir: String, budget: BigDecimal,
      currency: String = Epsilon,
      deltaBudget: BigDecimal = BigDecimal(0)): DpLedger = {
    require(currency == Epsilon || currency == Rho,
      s"unknown ledger currency '$currency' (expected '$Epsilon' or '$Rho')")
    require(deltaBudget >= 0, s"deltaBudget must be non-negative, got $deltaBudget")
    val d = new java.io.File(dir)
    if (!d.exists()) require(d.mkdirs(), s"cannot create ledger dir $dir")
    new DpLedger(dir, budget, currency, deltaBudget)
  }
}
