package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** The extraction plan conforms to the declared canonical schemas. */
class SchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = ExtractConfig(assetIssuer = "GISS")
  private def empty[T: org.apache.spark.sql.Encoder](xs: Seq[T]) = xs.toDS()

  test("payments/creations/operations schemas match Schemas declarations") {
    val txs = empty(Seq.empty[TxHistoryEntry])
    val ledgers = empty(Seq.empty[LedgerEntry])
    val results = empty(Seq.empty[TxResultEntry])
    assert(Extract.payments(txs, ledgers, results, cfg).schema === Schemas.payments)
    assert(Extract.creations(txs, ledgers, results, cfg).schema === Schemas.creations)
    assert(Extract.operations(txs, ledgers, results, cfg).schema === Schemas.operations)
  }
}
