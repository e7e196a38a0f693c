package graft.xdr

import graft.pipeline._

/** Encoder for the same archive-entry subset [[Stellar]] decodes — used to
  * generate binary fixtures for round-trip tests and local streaming
  * demos (the reference's archives are not available offline).
  */
object StellarWriter {

  private def accountId(w: XdrWriter, addr: String): Unit = {
    w.int(0) // PUBLIC_KEY_TYPE_ED25519
    w.opaque(Stellar.strkeyDecode(addr))
  }

  private def asset(w: XdrWriter, a: Asset): Unit = a.alphaNum4 match {
    case None => w.int(0)
    case Some(an4) =>
      w.int(1)
      w.opaque(an4.assetCode.getBytes("UTF-8").padTo(4, 0.toByte))
      accountId(w, an4.issuer.ed25519)
  }

  private def operation(w: XdrWriter, op: Operation): Unit = {
    w.optional(op.sourceAccount.headOption)(s => accountId(w, s.ed25519))
    op.body.opType match {
      case 0 =>
        val c = op.body.createAccountOp.get
        w.int(0); accountId(w, c.destination.ed25519); w.hyper(c.startingBalance.toLong)
      case 1 =>
        val p = op.body.paymentOp.get
        w.int(1); accountId(w, p.destination.ed25519); asset(w, p.asset); w.hyper(p.amount.toLong)
      case t => throw new IllegalArgumentException(s"cannot encode op type $t")
    }
  }

  private def transaction(w: XdrWriter, tx: TxCore): Unit = {
    accountId(w, tx.sourceAccount.ed25519)
    w.uint(tx.fee.toLong)
    w.hyper(1L)          // seqNum
    w.bool(false)        // no timeBounds
    tx.memoText match {
      case None => w.int(0)
      case Some(t) => w.int(1); w.string(t)
    }
    w.array(tx.operations)(operation(w, _))
    w.int(0)             // ext
  }

  def encodeLedgerEntry(e: LedgerEntry): Array[Byte] = {
    val w = new XdrWriter
    val zero32 = new Array[Byte](32)
    w.opaque(zero32)                   // entry hash
    w.int(15)                          // ledgerVersion
    w.opaque(zero32)                   // previousLedgerHash
    w.opaque(zero32)                   // scpValue.txSetHash
    w.hyper(e.header.scpValue.closeTime)
    w.int(0)                           // upgrades<>
    w.int(0)                           // StellarValue ext
    w.opaque(zero32); w.opaque(zero32) // txSetResultHash bucketListHash
    w.uint(e.header.ledgerSeq)
    w.hyper(0L); w.hyper(0L); w.int(0); w.hyper(0L)
    w.int(100); w.int(5000000); w.int(1000)
    (0 until 4).foreach(_ => w.opaque(zero32))
    w.int(0); w.int(0)
    RecordMark.frame(w.bytes)
  }

  def encodeTxEntry(e: TxHistoryEntry): Array[Byte] = {
    val w = new XdrWriter
    w.uint(e.ledgerSeq)
    w.opaque(new Array[Byte](32))
    w.array(e.txSet.txs) { t =>
      transaction(w, t.tx)
      w.int(0) // signatures<>
    }
    w.int(0)
    RecordMark.frame(w.bytes)
  }

  private val TxCodeNums = Map(
    "txFEE_BUMP_INNER_SUCCESS" -> 1, "txSUCCESS" -> 0, "txFAILED" -> -1,
    "txTOO_EARLY" -> -2, "txTOO_LATE" -> -3, "txMISSING_OPERATION" -> -4,
    "txBAD_SEQ" -> -5, "txBAD_AUTH" -> -6, "txINSUFFICIENT_BALANCE" -> -7,
    "txNO_ACCOUNT" -> -8, "txINSUFFICIENT_FEE" -> -9, "txBAD_AUTH_EXTRA" -> -10,
    "txINTERNAL_ERROR" -> -11)
  private val PayCodeNums = Map(
    "PAYMENT_SUCCESS" -> 0, "PAYMENT_MALFORMED" -> -1, "PAYMENT_UNDERFUNDED" -> -2,
    "PAYMENT_SRC_NO_TRUST" -> -3, "PAYMENT_SRC_NOT_AUTHORIZED" -> -4,
    "PAYMENT_NO_DESTINATION" -> -5, "PAYMENT_NO_TRUST" -> -6,
    "PAYMENT_NOT_AUTHORIZED" -> -7, "PAYMENT_LINE_FULL" -> -8, "PAYMENT_NO_ISSUER" -> -9)
  private val CreateCodeNums = Map(
    "CREATE_ACCOUNT_SUCCESS" -> 0, "CREATE_ACCOUNT_MALFORMED" -> -1,
    "CREATE_ACCOUNT_UNDERFUNDED" -> -2, "CREATE_ACCOUNT_LOW_RESERVE" -> -3,
    "CREATE_ACCOUNT_ALREADY_EXIST" -> -4)

  def encodeResultEntry(e: TxResultEntry, ledgerSeq: Long = 0L): Array[Byte] = {
    val w = new XdrWriter
    w.uint(ledgerSeq)
    w.array(e.txResultSet.results) { p =>
      val hashBytes = p.transactionHash.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
      w.opaque(hashBytes)
      w.hyper(p.result.feeCharged.toLong)
      val txCode = TxCodeNums(p.result.result.code)
      w.int(txCode)
      if (txCode == 0 || txCode == -1 || txCode == 1) {
        val legs = p.result.result.results.getOrElse(Nil)
        w.array(legs) { leg =>
          (Option(leg).map(_.tr.paymentResult).flatten, Option(leg).map(_.tr.createAccountResult).flatten) match {
            case (Some(pc), _) => w.int(0); w.int(1); w.int(PayCodeNums(pc))
            case (_, Some(cc)) => w.int(0); w.int(0); w.int(CreateCodeNums(cc))
            case _             => w.int(-1) // opBAD_AUTH: void arm
          }
        }
      }
      w.int(0)
    }
    w.int(0)
    RecordMark.frame(w.bytes)
  }
}
