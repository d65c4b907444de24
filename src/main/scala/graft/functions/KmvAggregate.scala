package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the object-buffer aggregate extension
  * tier (SURVEY §2.9: scalar `Expression` = dot_product, typed
  * `Aggregator` = TopK, `TypedImperativeAggregate` = this).
  *
  * The buffer is the set of the k smallest DISTINCT hash values seen;
  * estimate = (k−1)·2³² / h_k (or the exact set size when fewer than k
  * distinct hashes exist). Unlike HLL/CMS, a min-k set is completely
  * ORDER-INDEPENDENT under update and merge — min_k(A ∪ B) =
  * min_k(min_k(A) ∪ min_k(B)) — so the distributed estimate is
  * bit-identical to a single-threaded replay and the DuckDB oracle can
  * recompute the exact same integer (full hash-match, not a bounds
  * check like q114/q117/q126).
  *
  * The hash is computed OUTSIDE the aggregate (first 8 md5 hex chars →
  * long) so both engines share it; this expression only maintains the
  * min-k set. Buffer is O(k) longs; partials ship k longs per
  * partition regardless of input size.
  */
// explicitly Serializable: were it not, Java deserialization would
// invoke ITS no-arg constructor to rebuild leaf instances (running any
// constructor body against still-default fields)
abstract class KmvBase
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with Serializable {
  def child: Expression
  def k: Int

  override def children: Seq[Expression] = Seq(child)

  // no inputTypes override (AbstractDataType is private[sql] in Spark 4);
  // the LongType contract is enforced by checkInputDataTypes instead
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_distinct expects BIGINT, got ${child.dataType.simpleString}")

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    buf.add(v)
    if (buf.size > k) buf.pollLast()
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) { buf.add(in.readLong()); n -= 1 }
    buf
  }

}

/** The distinct-count estimate: (k−1)·2³² / h_k, exact below k. */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvBase {
  require(k >= 2, "KMV needs at least 2 minima")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def dataType: DataType = LongType
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else ((k - 1).toLong * 4294967296L) / buf.last()
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_kmv_distinct"
}

/** The min-k set itself (sorted ascending) — the mergeable summary
  * KMV set algebra runs on: min_k(A ∪ B) = min_k(min_k(A) ∪ min_k(B)),
  * so union/intersection cardinality estimates compose from sketches
  * without touching the underlying sets (q150). */
case class KmvMinima(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvBase {
  require(k >= 2, "KMV needs at least 2 minima")
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinima =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_kmv_minima"
}

object KmvAggregate {
  /** Column API: KMV distinct estimate over a LongType hash column. */
  def kmvDistinct(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expr(hash), k).toAggregateExpression())

  /** Column API: the sorted min-k hash set (array<bigint>). */
  def kmvMinima(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMinima(ColumnBridge.expr(hash), k).toAggregateExpression())
}
