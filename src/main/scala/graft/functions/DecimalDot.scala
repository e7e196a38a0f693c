package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact decimal dot product of two float arrays as a native expression —
  * the hot-path replacement for the equivalent (but interpreted)
  * `aggregate(zip_with(a, b, (x,y) -> x*y) :: DECIMAL(28,12))` pipeline
  * used by the similarity/dedup operators.
  *
  * Bit-identical by construction with both the Catalyst lambda spelling
  * and DuckDB's decimal cast on this data: each per-element product is
  * computed in double (IEEE-identical in both engines), rounded to scale
  * 12 exactly like Spark's double→decimal cast (HALF_UP on the shortest-
  * decimal string, which is what `BigDecimal.valueOf(double)` yields),
  * summed exactly as scaled longs (associative — order-independent), and
  * converted back via BigDecimal.doubleValue like a decimal→double cast.
  *
  * Generated code is a single static call, so surrounding operators stay
  * inside one whole-stage-codegen span.
  */
case class DecimalDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "decimal_dot"
  // SQL-NULL parity with the lambda spelling this kernel replaces:
  // unequal lengths (zip_with pads with null) or a null element both
  // yield NULL there, so they must here too — a kernel swapped in by
  // the optimizer must never change a query's answer
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r = graft.functions.DecimalDot.dot($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecimalDot =
    copy(left = l, right = r)
}

object DecimalDot {
  /** Static hot path shared by eval and generated code. Returns null
    * (SQL NULL) for unequal lengths or null elements — the answers the
    * portable lambda spelling gives. The fast path accumulates the
    * scale-12 unscaled sum in a long with OVERFLOW DETECTION
    * (add/multiplyExact-style): a dot product beyond ~9.2e6 in
    * magnitude silently wrapped before; now it falls back to exact
    * BigDecimal accumulation, erroring only where the DECIMAL(28,12)
    * spelling itself would overflow under ANSI.
    */
  def dot(xs: ArrayData, ys: ArrayData): java.lang.Double = {
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      i += 1
    }
    try fastDot(xs, ys, n)
    catch { case _: ArithmeticException => exactDot(xs, ys, n) }
  }

  private def fastDot(xs: ArrayData, ys: ArrayData, n: Int): java.lang.Double = {
    var acc = 0L // unscaled at scale 12
    var i = 0
    while (i < n) {
      val p = xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      acc = Math.addExact(acc,
        JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP)
          .unscaledValue().longValueExact())
      i += 1
    }
    JBigDecimal.valueOf(acc, 12).doubleValue()
  }

  private def exactDot(xs: ArrayData, ys: ArrayData, n: Int): java.lang.Double = {
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      acc = acc.add(JBigDecimal.valueOf(p).setScale(12, RoundingMode.HALF_UP))
      i += 1
    }
    if (acc.precision > 28)
      throw new ArithmeticException(
        s"decimal_dot overflow: $acc exceeds DECIMAL(28,12) (the portable spelling errors here too)")
    acc.doubleValue()
  }
}

/** Plain double dot product (sequential summation) — NOT cross-engine
  * exact; used as the cheap pre-filter in filter-then-verify pipelines
  * (|FloatDot − DecimalDot| ≤ 64·5e-13 for unit-scale embeddings, so a
  * 1e-6 threshold margin is conservative).
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FloatDot.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}

object FloatDot {
  def dot(xs: ArrayData, ys: ArrayData): Double = {
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}
