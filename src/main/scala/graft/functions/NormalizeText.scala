package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.text.Normalizer

/** Unicode NFC canonical normalization of a string column as a native
  * Catalyst expression (§2.13 custom-expression surface) — the text-
  * canonicalization step that belongs BEFORE any hash-based dedup or
  * fingerprint operator: canonically-equivalent strings ("e" + U+0301
  * vs precomposed U+00E9) otherwise hash apart and silently defeat
  * exact/MinHash/SimHash dedup on mixed-provenance corpora.
  *
  * Whole-stage-codegen'd like [[RollingHash]] (one static call, no UDF
  * serialization); null-safe via UnaryExpression's default eval. The
  * fast path skips allocation entirely: `Normalizer.isNormalized` is
  * O(n) with no copy, and ASCII (the overwhelming case in web corpora)
  * short-circuits inside it, so the expression costs a scan of the
  * bytes unless real recomposition work exists.
  *
  * Semantics match DuckDB's `nfc_normalize` (both delegate to the
  * Unicode canonical-composition algorithm), which serves as the
  * x28 oracle — for VALID UTF-8 input. Invalid byte sequences are
  * replaced with U+FFFD consistently on BOTH paths (the fast path
  * checks validity before returning the original bytes, so output
  * never depends on which path ran); DuckDB instead rejects invalid
  * UTF-8 outright, so the oracle comparison presumes valid input.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeNfc.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfc.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object NormalizeNfc {
  /** Static hot-path helper the generated code calls directly.
    *
    * The no-copy fast path may only return the ORIGINAL bytes when they
    * are valid UTF-8: `toString` replaces invalid sequences with U+FFFD,
    * so for invalid input the original bytes and the round-tripped
    * string differ even when the latter is already NFC — both paths must
    * agree on the U+FFFD-replaced result. `isValid` is a scan with no
    * allocation, so the valid-ASCII common case stays copy-free.
    */
  def nfc(s: UTF8String): UTF8String = {
    val valid = s.isValid
    val str = if (valid) s.toString else s.toValidString
    if (valid && Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
