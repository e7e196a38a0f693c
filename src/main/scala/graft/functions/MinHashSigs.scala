package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `n` MinHash signature values of a shingle array in one pass — the
  * native replacement for explode + n× `min(md5(i || '|' || shingle))`
  * aggregates: no generator, no shuffle, one digest per (seed, shingle)
  * in a tight loop. Value-identical with the SQL spelling: same md5
  * input bytes, min taken over the digest bytes (unsigned lexicographic —
  * the same order as the hex strings the oracle compares), hex-encoded at
  * the end.
  */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.sigs(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSigs.sigs($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  /** Static hot path shared by eval and generated code. */
  def sigs(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val n = arr.numElements()
    // no shingles → an EMPTY signature (not numHashes nulls): callers
    // detect it with size(sig) and drop the row in the same projection,
    // which lets bandKeys run shingle+sign in ONE pass instead of a
    // filter that re-evaluates word_shingles ahead of the project
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill[Array[Byte]](numHashes)(null)
    // row-invariant state hoisted off the per-row path (this is the
    // dedup pipeline's hottest kernel): the digest is thread-local, the
    // seed prefixes are cached per numHashes
    val md = localMd.get()
    val prefixes = prefixCache.computeIfAbsent(numHashes,
      h => Array.tabulate(h)(i => s"$i|".getBytes("UTF-8")))
    var j = 0
    while (j < n) {
      val shingle = arr.getUTF8String(j).getBytes
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(prefixes(i))
        md.update(shingle)
        val dig = md.digest()
        if (mins(i) == null || unsignedLess(dig, mins(i))) mins(i) = dig
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins.map(d => UTF8String.fromString(hex(d))): Array[Any])
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val localMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xff
      cs(2 * i) = HexChars(b >>> 4)
      cs(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(cs)
  }
}
