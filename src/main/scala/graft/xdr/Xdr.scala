package graft.xdr

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal XDR (RFC 4506) primitives: big-endian 4-byte alignment, var
  * arrays as count + elements, opaques padded to 4 bytes.
  *
  * Written from the public RFC; used by [[Stellar]] for the archive entry
  * subset the reference consumes (SURVEY.md §1.3).
  */
final class XdrReader(buf: Array[Byte]) {
  private val bb = ByteBuffer.wrap(buf).order(ByteOrder.BIG_ENDIAN)

  def remaining: Int = bb.remaining()
  def int(): Int = bb.getInt()
  def uint(): Long = bb.getInt().toLong & 0xffffffffL
  def hyper(): Long = bb.getLong()
  def uhyper(): Long = bb.getLong()
  def bool(): Boolean = int() != 0

  def opaque(n: Int): Array[Byte] = {
    val a = new Array[Byte](n); bb.get(a)
    val pad = (4 - n % 4) % 4
    bb.position(bb.position() + pad)
    a
  }

  def varOpaque(): Array[Byte] = opaque(int())
  def string(): String = new String(varOpaque(), "UTF-8")

  def optional[A](f: => A): Option[A] = if (bool()) Some(f) else None
  def array[A](f: => A): Vector[A] = Vector.fill(int())(f)
  def fixedArray[A](n: Int)(f: => A): Vector[A] = Vector.fill(n)(f)
}

/** Symmetric encoder — fixture generation and the encode side of the
  * round-trip tests.
  */
final class XdrWriter {
  private val bos = new ByteArrayOutputStream()
  private val out = new DataOutputStream(bos)

  def int(v: Int): this.type = { out.writeInt(v); this }
  def uint(v: Long): this.type = { out.writeInt(v.toInt); this }
  def hyper(v: Long): this.type = { out.writeLong(v); this }
  def bool(v: Boolean): this.type = int(if (v) 1 else 0)

  def opaque(a: Array[Byte]): this.type = {
    out.write(a)
    val pad = (4 - a.length % 4) % 4
    (0 until pad).foreach(_ => out.writeByte(0))
    this
  }

  def varOpaque(a: Array[Byte]): this.type = { int(a.length); opaque(a) }
  def string(s: String): this.type = varOpaque(s.getBytes("UTF-8"))
  def optional[A](o: Option[A])(f: A => Unit): this.type = {
    bool(o.isDefined); o.foreach(f); this
  }
  def array[A](xs: Seq[A])(f: A => Unit): this.type = { int(xs.size); xs.foreach(f); this }

  def bytes: Array[Byte] = bos.toByteArray
}

/** RFC 5531 record marking used by stellar history archive streams: each
  * record preceded by a 4-byte big-endian length with the high bit set on
  * the final fragment (stellar-core writes one fragment per record).
  */
object RecordMark {
  def frame(record: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + record.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(record.length | 0x80000000)
    bb.put(record)
    bb.array()
  }

  def unframe(stream: Array[Byte]): Vector[Array[Byte]] = {
    val bb = ByteBuffer.wrap(stream).order(ByteOrder.BIG_ENDIAN)
    val out = Vector.newBuilder[Array[Byte]]
    while (bb.remaining() >= 4) {
      val len = bb.getInt() & 0x7fffffff
      val rec = new Array[Byte](len)
      bb.get(rec)
      out += rec
    }
    out.result()
  }
}
