package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature aggregate: per group, the array of `n` lexicographic
  * mins of `md5("<i>:" + s)` (i ∈ [0, n)) over the group's shingles — ONE
  * aggregate computing what used to be `n` separate `min(md5(concat(...)))`
  * columns.
  *
  * Why it exists (round-19 optimization): `Min` over StringType is a
  * DeclarativeAggregate whose buffer is a string — not UnsafeRow-mutable —
  * so the old 12-column form forced **SortAggregate**: two full sorts of
  * the postings relation (partial + final) bracketing the signature pass.
  * A TypedImperativeAggregate runs under **ObjectHashAggregateExec**:
  * hash-grouped, no sort of the postings, with the standard sort-based
  * fallback under memory pressure. The update also hashes all `n` families
  * in one call over one reused MessageDigest and one prefix+shingle buffer,
  * instead of `n` separate concat+md5 expression trees per row.
  *
  * Exactness: md5 of the UTF-8 bytes of `"<i>:" + s`, rendered as the
  * 32-char lowercase hex Spark's `md5()` emits; min is byte-wise — on
  * equal-length ASCII hex exactly the string min. A null shingle
  * contributes nothing (its md5 is null and `min` skips nulls); a group
  * whose every shingle was null yields null ELEMENTS (each `min` over an
  * empty set), matching the column form slot for slot. */
case class MinHashMins(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Array[Byte]]] with BinaryLike[Expression] {

  override def prettyName: String = "minhash_mins"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if right.foldable =>
        val n = right.eval()
        if (n != null && n.asInstanceOf[Int] > 0 && n.asInstanceOf[Int] <= 512)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"minhash_mins needs a hash count in [1, 512], got $n")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash_mins requires (string, int literal), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  private lazy val n: Int = right.eval().asInstanceOf[Int]
  // "<i>:" prefixes, precomputed once per operator
  private lazy val prefixes: Array[Array[Byte]] =
    (0 until n).map(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Array[Byte]] =
    new Array[Array[Byte]](n) // per-family current min hex bytes; null = empty

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val s = left.eval(input)
    if (s == null) return buf // null shingle: null md5, min skips it
    val sBytes = s.asInstanceOf[UTF8String].getBytes
    val md = MinHashMins.digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      md.update(prefixes(i))
      md.update(sBytes)
      val hex = MinHashMins.hex(md.digest())
      if (buf(i) == null || MinHashMins.lt(hex, buf(i))) buf(i) = hex
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Array[Byte]], other: Array[Array[Byte]]): Array[Array[Byte]] = {
    var i = 0
    while (i < n) {
      val o = other(i)
      if (o != null && (buf(i) == null || MinHashMins.lt(o, buf(i)))) buf(i) = o
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Array[Byte]]): Any =
    new GenericArrayData(buf.map(b =>
      if (b == null) null else UTF8String.fromBytes(b)))

  // [present-flag byte + 32 hex bytes] per family
  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](n * 33)
    var i = 0
    while (i < n) {
      if (buf(i) != null) {
        out(i * 33) = 1
        System.arraycopy(buf(i), 0, out, i * 33 + 1, 32)
      }
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val buf = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (bytes(i * 33) == 1) {
        val b = new Array[Byte](32)
        System.arraycopy(bytes, i * 33 + 1, b, 0, 32)
        buf(i) = b
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMins =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMins =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashMins =
    copy(left = newLeft, right = newRight)
}

object MinHashMins {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".getBytes

  /** 16 md5 bytes → 32 lowercase hex bytes (what Spark's `md5()` renders). */
  private[plans] def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      out(2 * i) = HexChars(b >>> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    out
  }

  /** Byte-wise less-than on equal-length ASCII hex — the string order. */
  private[plans] def lt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return (a(i) & 0xff) < (b(i) & 0xff)
      i += 1
    }
    false
  }
}
