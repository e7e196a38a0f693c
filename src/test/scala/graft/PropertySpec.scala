package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._
import graft.sources.Archive
import graft.xdr.{Stellar, StellarWriter}

/** Property tests generalizing the reference's schema-driven random-row
  * generators (reference python/tests/test_postgres_storage_adapter.py:
  * 278-302) to the whole XDR round trip: for arbitrary valid model
  * values, encode → (gzip) → decode is the identity.
  */
class PropertySpec extends AnyFunSuite {

  private val genKey: Gen[Array[Byte]] =
    Gen.containerOfN[Array, Byte](32, Gen.choose(Byte.MinValue, Byte.MaxValue))
  private val genAddr: Gen[String] = genKey.map(Stellar.strkeyEncode)

  private val genAsset: Gen[Asset] = Gen.oneOf(
    Gen.const(Asset(None)),
    for {
      code <- Gen.oneOf("KIN", "USD", "ABCD", "X")
      iss <- genAddr
    } yield Asset(Some(AssetAlphaNum4(code, Ed25519(iss)))))

  private val genOp: Gen[Operation] = for {
    src <- Gen.option(genAddr)
    dest <- genAddr
    amt <- Gen.choose(0L, 1L << 53) // doubles stay exact
    isPay <- Gen.oneOf(true, false)
    asset <- genAsset
  } yield
    if (isPay)
      Operation(src.map(Ed25519(_)).toSeq,
        OpBody(1, Some(PaymentOp(asset, Ed25519(dest), amt.toDouble)), None))
    else
      Operation(src.map(Ed25519(_)).toSeq,
        OpBody(0, None, Some(CreateAccountOp(Ed25519(dest), amt.toDouble))))

  private val genTx: Gen[TxWithHash] = for {
    memo <- Gen.option(Gen.alphaNumStr.map(_.take(28)))
    fee <- Gen.choose(0, 1000000)
    src <- genAddr
    ops <- Gen.listOfN(3, genOp).map(_.take(3))
    nOps <- Gen.choose(0, 3)
  } yield TxWithHash("", TxCore(memo, fee, Ed25519(src), ops.take(nOps)))

  private val genTxEntry: Gen[TxHistoryEntry] = for {
    seq <- Gen.choose(0L, 0xffffffffL)
    n <- Gen.choose(0, 4)
    txs <- Gen.listOfN(n, genTx)
  } yield TxHistoryEntry(seq, TxSet(txs))

  private val genLedger: Gen[LedgerEntry] = for {
    seq <- Gen.choose(0L, 0xffffffffL)
    close <- Gen.choose(0L, 4102444800L)
  } yield LedgerEntry(LedgerHeader(seq, ScpValue(close)))

  private val genOpResult: Gen[OpResult] = Gen.oneOf(
    Gen.const(OpResult(OpResultTr(None, None))),
    Gen.oneOf("PAYMENT_SUCCESS", "PAYMENT_UNDERFUNDED", "PAYMENT_NO_TRUST")
      .map(c => OpResult(OpResultTr(Some(c), None))),
    Gen.oneOf("CREATE_ACCOUNT_SUCCESS", "CREATE_ACCOUNT_LOW_RESERVE")
      .map(c => OpResult(OpResultTr(None, Some(c)))))

  private val genResultPair: Gen[TxResultPair] = for {
    hashBytes <- Gen.containerOfN[Array, Byte](32, Gen.choose(Byte.MinValue, Byte.MaxValue))
    fee <- Gen.choose(0, 1000000)
    code <- Gen.oneOf("txSUCCESS", "txFAILED", "txBAD_SEQ", "txNO_ACCOUNT")
    legs <- if (code == "txSUCCESS" || code == "txFAILED")
      Gen.some(Gen.listOfN(2, genOpResult).map(_.toSeq)) else Gen.const(None)
  } yield TxResultPair(hashBytes.map(b => f"$b%02x").mkString,
    TxResultOuter(fee, TxResultInner(code, legs)))

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, s"$name: $res")
  }

  test("strkey: encode/decode identity for arbitrary 32-byte keys") {
    check("strkey", Prop.forAll(genKey) { k =>
      Stellar.strkeyDecode(Stellar.strkeyEncode(k)).sameElements(k)
    })
  }

  test("tx entries: encode → gzip → decode is the identity (modulo computed hash)") {
    check("tx", Prop.forAll(genTxEntry) { e =>
      val decoded = Stellar.decodeTxEntries(
        Archive.gunzip(Archive.gzip(StellarWriter.encodeTxEntry(e))), "PropNet").head
      decoded.ledgerSeq == e.ledgerSeq &&
        decoded.txSet.txs.map(_.tx) == e.txSet.txs.map(_.tx) &&
        decoded.txSet.txs.forall(_.hash.matches("^[0-9a-f]{64}$"))
    })
  }

  test("ledger entries: encode → decode identity") {
    check("ledger", Prop.forAll(genLedger) { e =>
      Stellar.decodeLedgerEntries(StellarWriter.encodeLedgerEntry(e)).head == e
    })
  }

  test("result entries: encode → decode identity") {
    check("results", Prop.forAll(Gen.listOfN(3, genResultPair)) { pairs =>
      val e = TxResultEntry(TxResultSet(pairs))
      Stellar.decodeResultEntries(StellarWriter.encodeResultEntry(e, 1L)).head == e
    })
  }

  // Strings over a mix of ASCII, precomposed/decomposed accents, and
  // standalone combining marks — the NFC-interesting alphabet without
  // surrogates (UTF-8 encodes them lossily and the contract presumes
  // valid input).
  private val genNfcString: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'e', 'o', ' ', '\u00e9', '\u0301', '\u0300',
      '\u00f4', 'n', '\u0303')).map(_.mkString)

  test("nfc: idempotent and agrees with java.text.Normalizer on valid input") {
    import org.apache.spark.unsafe.types.UTF8String
    check("nfc", Prop.forAll(genNfcString) { s =>
      val once = graft.functions.NormalizeNfc.nfc(UTF8String.fromString(s))
      val twice = graft.functions.NormalizeNfc.nfc(once)
      once.toString == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC) &&
        twice == once
    })
  }

  test("DpLedger: arbitrary (eps, delta) charge sequences never overdraw either budget, and a reload resumes both exact spends") {
    // The budget invariant as a property, not a scenario — extended
    // round 19 to the (ε, δ) PAIR: for ANY sequence of positive-ε,
    // non-negative-δ decimal charges against ANY pair of budgets,
    // (1) neither admitted spend ever exceeds its budget, (2) each
    // spend == the exact sum of the admitted charges' coordinate and
    // nothing else, (3) refusals are exactly the proposals where
    // EITHER coordinate would overdraw AT THEIR TURN (order matters —
    // a refused large charge must not block a later smaller one; a
    // refusal burns neither coordinate), and (4) a close-and-reopen
    // resumes the identical exact BigDecimal pair (the decimal-string
    // durability contract, now two columns).
    val genEps: Gen[BigDecimal] = Gen.oneOf(
      Gen.choose(1, 400).map(n => BigDecimal(n) / 100),      // 0.01..4.00
      Gen.oneOf("0.1", "0.25", "0.333333333", "1", "1.5").map(BigDecimal(_)))
    val genDelta: Gen[BigDecimal] = Gen.oneOf(
      Gen.const(BigDecimal(0)),                              // pure-ε rows
      Gen.choose(1, 9).map(n => BigDecimal(n) / 1000000))    // 1e-6..9e-6
    val genSeqC = Gen.listOfN(12, Gen.zip(genEps, genDelta))
    val genBudget = Gen.choose(1, 80).map(n => BigDecimal(n) / 10) // 0.1..8.0
    val genDeltaBudget = Gen.choose(0, 40).map(n => BigDecimal(n) / 1000000)
    check("ledger", Prop.forAll(genSeqC, genBudget, genDeltaBudget) {
      (charges, budget, deltaBudget) =>
        val dir = java.nio.file.Files.createTempDirectory("graft-prop-ledger").toString
        val led = graft.operators.DpLedger.open(dir, budget,
          deltaBudget = deltaBudget)
        var expectSpent = BigDecimal(0)
        var expectDelta = BigDecimal(0)
        val verdictsOk = charges.zipWithIndex.forall { case ((eps, dlt), i) =>
          val shouldAdmit = expectSpent + eps <= budget &&
            expectDelta + dlt <= deltaBudget
          val admitted = led.tryCharge(s"c$i", "prop", eps, delta = dlt)
          if (admitted) { expectSpent += eps; expectDelta += dlt }
          admitted == shouldAdmit && led.spent <= budget &&
            led.spentDelta <= deltaBudget &&
            led.spent == expectSpent && led.spentDelta == expectDelta
        }
        led.close()
        val reopened = graft.operators.DpLedger.open(dir, budget,
          deltaBudget = deltaBudget)
        val resumed = reopened.spent == expectSpent &&
          reopened.spentDelta == expectDelta
        reopened.close()
        verdictsOk && resumed
    })
  }

  test("RdpAccountant: arbitrary (q, sigma) schedules never read past the budget; refusal is exactly the conversion verdict; reload is bit-identical") {
    // the DpLedger property at the Rényi currency: for ANY schedule of
    // (q, σ) charges against ANY ε budget, (1) the readout after every
    // admitted charge stays ≤ budget, (2) a proposal is admitted iff
    // the POST-charge conversion would stay within budget at its turn
    // (re-derived here from the public per-order math), (3) a refusal
    // changes neither the readout nor the registry, and (4) a
    // close-and-reopen recomputes the identical readout from the
    // (q, σ) rows (the recompute-at-load durability contract).
    import graft.operators.RdpAccountant
    val genQ: Gen[Double] = Gen.oneOf(0.1, 0.25, 0.5, 0.75, 0.9)
    val genSigma: Gen[Double] = Gen.oneOf(2.0, 4.0, 5.298802527, 8.0)
    val genSched = Gen.listOfN(8, Gen.zip(genQ, genSigma))
    val genBudget = Gen.choose(1, 40).map(n => BigDecimal(n) / 10) // 0.1..4.0
    check("rdp", Prop.forAll(genSched, genBudget) { (sched, budget) =>
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-rdp").toString
      val acc = RdpAccountant.open(dir, budget)
      var totals = Vector.fill(RdpAccountant.Orders.length)(BigDecimal(0))
      def eps(t: Vector[BigDecimal]): Double =
        RdpAccountant.Orders.zip(t).map { case (a, v) =>
          v.toDouble + BigDecimal(math.log(1e6))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble / (a - 1)
        }.min
      val verdictsOk = sched.zipWithIndex.forall { case ((q, sigma), i) =>
        val after = RdpAccountant.Orders.zip(totals).map { case (a, v) =>
          v + BigDecimal(RdpAccountant.rdpSampledGaussian(q, sigma, a))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        val shouldAdmit = BigDecimal(eps(after)) <= budget
        val admitted = acc.tryCharge(s"c$i", q, sigma)
        if (admitted) totals = after
        val readout = if (totals.forall(_ == 0)) 0.0 else eps(totals)
        admitted == shouldAdmit && acc.spentEpsilon == readout &&
          (totals.forall(_ == 0) || BigDecimal(acc.spentEpsilon) <= budget)
      }
      val expectEps = acc.spentEpsilon
      val expectN = acc.size
      acc.close()
      val reopened = RdpAccountant.open(dir, budget)
      val resumed = reopened.spentEpsilon == expectEps &&
        reopened.size == expectN
      reopened.close()
      verdictsOk && resumed
    })
  }

  test("checkpoint math: stride-64 invariants and path fan-out") {
    check("ckpt", Prop.forAll(Gen.choose(0L, 0x3ffffffL)) { n =>
      val seq = n * 64 + 63
      val s = Archive.seqString(seq)
      val path = Archive.pathFor("root", "ledger", seq)
      Archive.isCheckpoint(seq) &&
        Archive.isCheckpoint(Archive.nextSeq(seq)) &&
        !Archive.isCheckpoint(seq + 1) &&
        s.length == 8 && s == f"$seq%08x" &&
        path == s"root/ledger/${s.substring(0, 2)}/${s.substring(2, 4)}/${s.substring(4, 6)}/ledger-$s.xdr.gz"
    })
  }
}
