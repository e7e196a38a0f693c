package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a text column in one pass — the native
  * replacement for `array_distinct(filter(transform(split(text,' '), …)))`,
  * whose interpreted lambdas plus O(n²) array_distinct dominate the
  * MinHash pipeline cost.
  *
  * Semantics match the declarative spelling exactly: split on single
  * spaces KEEPING empty tokens (what `split(text, ' ')` /
  * `string_split(text, ' ')` produce), shingle = n consecutive tokens
  * joined by spaces, distinct as a set (first-occurrence order; every
  * consumer is order-insensitive).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Static hot path shared by eval and generated code. */
  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new mutable.LinkedHashSet[String]
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out += sb.toString
      i += 1
    }
    new GenericArrayData(out.iterator.map(UTF8String.fromString).toArray[Any])
  }
}
