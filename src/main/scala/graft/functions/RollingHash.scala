package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string column — the document-fingerprint
  * primitive (SURVEY.md §7.5 / §2.13 custom-expression surface) as a
  * native Catalyst expression: whole-stage-codegen'd (the generated code
  * is a single static call, no boxing, no UDF serialization), null-safe
  * via UnaryExpression's default eval.
  *
  * h₀ = 7; hᵢ = (hᵢ₋₁ · 31 + cᵢ) mod 1_000_000_007 over UTF-16 code units
  * (≡ code points for ASCII corpora; documented divergence for astral
  * planes vs codepoint-based oracles).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  final val Seed = 7L
  final val Mult = 31L
  final val Mod = 1000000007L

  /** Static hot-path helper the generated code calls directly. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = Seed
    var i = 0
    while (i < str.length) {
      h = (h * Mult + str.charAt(i)) % Mod
      i += 1
    }
    h
  }
}

/** Registration: per-session (temp function) or cluster-wide via
  * SparkSessionExtensions (`spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> (exprs => RollingHash(exprs.head)),
    "decimal_dot" -> (exprs => DecimalDot(exprs.head, exprs(1))),
    "float_dot" -> (exprs => FloatDot(exprs.head, exprs(1))),
    "minhash_sigs" -> (exprs => MinHashSigs(exprs.head, 8)),
    "word_shingles" -> (exprs => WordShingles(exprs.head, 3)),
    "nfc_normalize" -> (exprs => NormalizeNfc(exprs.head)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[RollingHash].getName, name),
        builder))
    }
    e.injectOptimizerRule(_ => NativeDotRule)
  }
}
