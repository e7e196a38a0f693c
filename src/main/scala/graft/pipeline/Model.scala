package graft.pipeline

/** Nested input model for the extraction pipeline — the Spark shape of the
  * XDR paths the reference consumes (SURVEY.md §1.3, FIXTURES.md §3;
  * reference paths cited from /root/reference/python/main.py:105-199).
  *
  * Stellar XDR optionals are 0/1-element arrays, hence `sourceAccount:
  * Seq[Ed25519]` on [[Operation]] (python/main.py:172-176 indexes `[0]`
  * with KeyError/IndexError fallback).
  */
final case class Ed25519(ed25519: String)

final case class AssetAlphaNum4(assetCode: String, issuer: Ed25519)
final case class Asset(alphaNum4: Option[AssetAlphaNum4])

final case class PaymentOp(asset: Asset, destination: Ed25519, amount: Double)
final case class CreateAccountOp(destination: Ed25519, startingBalance: Double)

/** `opType`: 1 = payment, 0 = create-account (python/main.py:160,184);
  * other types are dropped by the plan, matching the reference's implicit
  * `if/elif` fall-through.
  */
final case class OpBody(
    opType: Int,
    paymentOp: Option[PaymentOp],
    createAccountOp: Option[CreateAccountOp])

final case class Operation(sourceAccount: Seq[Ed25519], body: OpBody)

final case class TxCore(
    memoText: Option[String],
    fee: Int,
    sourceAccount: Ed25519,
    operations: Seq[Operation])

final case class TxWithHash(hash: String, tx: TxCore)
final case class TxSet(txs: Seq[TxWithHash])

/** One element of a `transactions-*.xdr` archive file. */
final case class TxHistoryEntry(ledgerSeq: Long, txSet: TxSet)

final case class ScpValue(closeTime: Long)
final case class LedgerHeader(ledgerSeq: Long, scpValue: ScpValue)

/** One element of a `ledger-*.xdr` archive file. */
final case class LedgerEntry(header: LedgerHeader)

/** Per-operation result leg; the code strings mirror Stellar result enums
  * (e.g. PAYMENT_SUCCESS / CREATE_ACCOUNT_LOW_RESERVE).
  */
final case class OpResultTr(paymentResult: Option[String], createAccountResult: Option[String])
final case class OpResult(tr: OpResultTr)

/** `results` is None/absent for transactions without per-op results; the
  * reference's `.get('results', [])` + zip then emits no op rows at all
  * (python/main.py:155).
  */
final case class TxResultInner(code: String, results: Option[Seq[OpResult]])
final case class TxResultOuter(feeCharged: Int, result: TxResultInner)
final case class TxResultPair(transactionHash: String, result: TxResultOuter)
final case class TxResultSet(results: Seq[TxResultPair])

/** One element of a `results-*.xdr` archive file. */
final case class TxResultEntry(txResultSet: TxResultSet)

/** Extraction configuration (python/main.py:27-58).
  *
  * `legacyAzClass` keeps the reference's literal `[A-z]` character class
  * (python/main.py:58, quirky: also matches `[\]^_` and backtick); set
  * false for the sane `[A-Za-z]` (SURVEY.md §7.4 fidelity decision).
  */
final case class ExtractConfig(
    assetIssuer: String,
    assetCode: String = "KIN",
    appId: Option[String] = None,
    legacyAzClass: Boolean = true) {
  def appIdRegex: String =
    if (legacyAzClass) "^1-[A-z0-9]{4}-.*" else "^1-[A-Za-z0-9]{4}-.*"
}
