package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MIN/MAX over a string column as a typed aggregate. Spark's declarative
  * `Min`/`Max` keep the candidate value IN the aggregation buffer; a
  * string-valued buffer is not UnsafeRow-mutable, so any aggregation mixing
  * one in falls off HashAggregate onto **SortAggregate** — a full sort of
  * the input per partial/final phase. The typed form runs under
  * ObjectHashAggregateExec (hash-grouped, sort fallback only under memory
  * pressure) and is bit-identical: UTF8String binary order IS the string
  * comparison `Min`/`Max` use, nulls are skipped, an empty/all-null group
  * yields NULL. Registered as `min_str` / `max_str`; the column profiler
  * ([[graft.operators.Profile]]) is the first consumer (r19). */
case class MinMaxStr(
    child: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[UTF8String]] with UnaryLike[Expression] {

  override def prettyName: String = if (isMin) "min_str" else "max_str"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a STRING column, got ${child.dataType.simpleString}")

  // one-slot buffer (a bare UTF8String can't distinguish "empty" reliably
  // through the serializer; the slot holds null until the first value)
  override def createAggregationBuffer(): Array[UTF8String] = Array(null)

  private def better(a: UTF8String, b: UTF8String): Boolean =
    if (isMin) a.compareTo(b) < 0 else a.compareTo(b) > 0

  override def update(buf: Array[UTF8String], input: InternalRow): Array[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      if (buf(0) == null || better(s, buf(0))) buf(0) = s.clone()
    }
    buf
  }

  override def merge(buf: Array[UTF8String], other: Array[UTF8String]): Array[UTF8String] = {
    if (other(0) != null && (buf(0) == null || better(other(0), buf(0))))
      buf(0) = other(0)
    buf
  }

  override def eval(buf: Array[UTF8String]): Any = buf(0)

  override def serialize(buf: Array[UTF8String]): Array[Byte] =
    if (buf(0) == null) Array.emptyByteArray
    else {
      val b = buf(0).getBytes
      val out = new Array[Byte](b.length + 1)
      out(0) = 1
      System.arraycopy(b, 0, out, 1, b.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): Array[UTF8String] =
    if (bytes.isEmpty) Array(null)
    else Array(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, 1, bytes.length)))

  override def withNewMutableAggBufferOffset(newOffset: Int): MinMaxStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinMaxStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinMaxStr =
    copy(child = newChild)
}
