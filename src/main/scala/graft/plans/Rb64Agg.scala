package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Native position-set aggregate: folds a LONG column into a compressed
  * Roaring64 bitmap, emitted as its portable serialized bytes. The build
  * side of the snapshot layer's DELETION VECTORS ([[graft.engine.Snapshots]],
  * merge-on-read deletes): a distributed scan marks matching rows by their
  * parquet `_metadata.row_index`, this aggregate compresses each file's
  * positions executor-side, and only the (file, bitmap-bytes) pairs reach
  * the driver — never the positions themselves. A [[TypedImperativeAggregate]]
  * because the buffer is the bitmap object (partial aggregation compresses
  * on the map side; `merge` is a bitmap OR), exactly the shape Spark's own
  * BloomFilterAggregate uses for its sketch.
  *
  * Null inputs are skipped (a null position marks nothing). Output is
  * BinaryType, non-null (an empty group yields an empty bitmap's bytes).
  */
case class Rb64Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] with UnaryLike[Expression] {

  override def prettyName: String = "rb64_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rb64_agg needs a BIGINT position column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buffer: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64Bitmap): Any = serialize(buffer)

  override def serialize(buffer: Roaring64Bitmap): Array[Byte] = {
    buffer.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    buffer.serialize(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): Rb64Agg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): Rb64Agg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Rb64Agg =
    copy(child = newChild)
}
