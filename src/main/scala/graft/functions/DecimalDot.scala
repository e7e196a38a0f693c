package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact decimal dot product of two float arrays as a native expression —
  * the hot-path replacement for the equivalent (but interpreted)
  * `aggregate(zip_with(a, b, (x,y) -> x*y) :: DECIMAL(28,12))` pipeline
  * used by the similarity/dedup operators.
  *
  * Bit-identical by construction with both the Catalyst lambda spelling
  * and DuckDB's decimal cast on this data: each per-element product is
  * computed in double (IEEE-identical), rounded to scale 12 exactly like
  * Spark's double→decimal cast (HALF_UP on the shortest-decimal string,
  * which is what `BigDecimal.valueOf(double)` yields), summed exactly as
  * scaled longs (associative — order-independent), and converted back via
  * BigDecimal.doubleValue like a decimal→double cast.
  *
  * CodegenFallback is fine here: the expression itself is one tight JVM
  * loop per row; falling out of whole-stage codegen for a 64-element
  * array dot costs far less than the interpreted higher-order pipeline.
  */
case class DecimalDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0L // unscaled at scale 12
    var i = 0
    while (i < n) {
      val p = xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      acc += JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    JBigDecimal.valueOf(acc, 12).doubleValue()
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecimalDot =
    copy(left = l, right = r)
}

/** Plain double dot product (sequential summation) — NOT cross-engine
  * exact; used as the cheap pre-filter in filter-then-verify pipelines
  * (|FloatDot − DecimalDot| ≤ 64·5e-13 for unit-scale embeddings, so a
  * 1e-6 threshold margin is conservative).
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}
