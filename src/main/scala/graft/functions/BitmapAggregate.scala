package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact distinct-set bitmap over a DENSE integer key domain as a
  * `TypedImperativeAggregate` — the exact counterpart of the KMV
  * sketch (KmvAggregate): where KMV ships k minima and estimates, the
  * bitmap ships capacity/64 words and is EXACT, the roaring-bitmap
  * production pattern for id domains that are dense (user ids, row
  * ids after dictionary encoding). Update sets one bit; merge is a
  * word-wise OR — fully order-independent, so the distributed result
  * is bit-identical to a single-threaded replay, and set algebra
  * (∩/∪ cardinalities, Jaccard) composes from the aggregated words
  * with no second scan (q236).
  *
  * Contract: inputs must lie in [0, capacityBits). Out-of-range input
  * FAILS LOUDLY rather than silently aliasing — a fixture or key-domain
  * drift must surface as a named error, not a wrong count (the
  * assertFixtureContract discipline applied to an aggregate).
  *
  * Scale: the buffer is capacityBits/64 longs per group regardless of
  * input rows (2 KiB for 16k keys); partials ship one bitmap per map
  * task per group. For sparse/huge domains the production swap is a
  * compressed (roaring) container with the same update/OR algebra.
  */
case class BitmapBits(
    child: Expression,
    capacityBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with Serializable {

  require(capacityBits > 0 && capacityBits % 64 == 0,
    "capacityBits must be a positive multiple of 64")
  private def words: Int = capacityBits / 64

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_bits expects BIGINT, got ${child.dataType.simpleString}")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0 || id >= capacityBits)
        throw new IllegalArgumentException(
          s"graft_bitmap_bits: key $id outside dense domain [0, $capacityBits)" +
            " — widen the capacity or re-map the key (silent aliasing refused)")
      buf((id >> 6).toInt) |= (1L << (id & 63))
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    var i = 0
    while (i < words) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < words) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBits =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_bitmap_bits"
}

object BitmapAggregate {
  /** Column API: exact presence bitmap (array<bigint> of words) over a
    * dense BIGINT key in [0, capacityBits). */
  def bitmapBits(key: Column, capacityBits: Int): Column =
    ColumnBridge.column(
      BitmapBits(ColumnBridge.expr(key), capacityBits).toAggregateExpression())

  /** Population count of a word array. */
  def popCount(bm: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(transform(bm, w => bit_count(w).cast("long")),
      lit(0L), (acc, v) => acc + v)
  }

  /** Population count of the word-wise AND of two bitmaps (|A ∩ B|). */
  def popCountAnd(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseAND(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)
  }

  /** Population count of the word-wise OR of two bitmaps (|A ∪ B|). */
  def popCountOr(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)
  }
}
