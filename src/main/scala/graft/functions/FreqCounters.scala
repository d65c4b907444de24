package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-counter frequent-items summary as a
  * `TypedImperativeAggregate` — the sketch-family completion next to
  * TopK (q38), KMV (q127/q150), CMS (q117) and HLL (q33/q114): a
  * Misra-Gries-footprint state (k counters, O(k) partials regardless of
  * input size) whose merge is COMMUTATIVE AND ASSOCIATIVE, so the
  * reported estimates are a pure function of the data and an external
  * engine can reproduce them bit-for-bit.
  *
  * Why not textbook Misra-Gries: MG's admission rule (decrement all
  * counters when a new key finds the summary full) makes the final
  * counter STATE depend on arrival order, and the Agarwal et al.
  * mergeable-summaries merge (sum counters, subtract the (k+1)-th
  * largest, drop non-positives) preserves only the ε·n ERROR BOUND
  * across merge trees — two shuffle schedules can legitimately report
  * different numbers. That is the q117-CMS class of guarantee (bounds
  * checkable, values not). This engine's correctness gate hash-compares
  * VALUES, so the decrement rule is replaced with KMV hash admission
  * (q127's trick applied to frequency): a counter exists exactly for
  * the keys whose hash is among the k smallest seen, and counts only
  * ever ADD.
  *
  * Exactness of the surviving counters (same argument as KMV's min-k):
  * a key whose hash is globally among the k smallest has fewer than k
  * smaller-hash keys in ANY subset of the data, so every partial admits
  * it on first sight and never trims it; merge sums complete per-key
  * counts and trims to the global min-k. The final summary is therefore
  * {(h, exact count of h)} for the k smallest key-hashes — order-free,
  * partitioning-free, oracle-reproducible. The trade: heavy-hitter
  * RECALL is probabilistic (the counters are a uniform key sample)
  * instead of MG's deterministic ε-guarantee; the exact complement
  * (q103's full recount) is the audit for what the sample missed.
  *
  * Input is the key's 32-bit hash (computed OUTSIDE the aggregate, from
  * the first 8 md5 hex chars, so both engines share it); hash
  * collisions merge counters identically in both engines.
  */
case class FreqCounters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]]
    with Serializable {
  require(k >= 1, "FreqCounters needs at least 1 counter")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_freq_counters expects BIGINT, got ${child.dataType.simpleString}")

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("hv", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def add(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      h: Long, c: Long): Unit = {
    val prev = buf.get(h)
    buf.put(h, if (prev == null) c else prev + c)
    if (buf.size > k) buf.pollLastEntry()
  }

  override def update(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
      other: java.util.TreeMap[java.lang.Long, java.lang.Long])
      : java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var n = in.readInt()
    while (n > 0) { buf.put(in.readLong(), in.readLong()); n -= 1 }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqCounters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqCounters =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_freq_counters"
}

object FreqCounters {
  /** Column API: array<struct<hv,cnt>> of exact counts for the k
    * smallest-hash keys, ascending by hash. */
  def freqCounters(hash: Column, k: Int): Column =
    ColumnBridge.column(
      FreqCounters(ColumnBridge.expr(hash), k).toAggregateExpression())
}
