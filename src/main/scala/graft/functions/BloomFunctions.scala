package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter build/probe surface over Spark's own sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair
  * Catalyst itself uses for injected runtime filters, but which ship
  * unregistered: no SQL name, no Column API). Registering them is the
  * one genuinely missing piece for a hand-built bloom semi-join — the
  * scale pattern where a small build side (an eval set, a blocklist)
  * prunes a 100 TB probe side BEFORE its shuffle, with false positives
  * killed by the exact join afterwards, so the final result is exact
  * regardless of bloom error.
  *
  * Both expressions take the 64-bit `xxhash64` of the value, matching
  * how Catalyst's InjectRuntimeFilter wires them.
  */
object BloomFunctions {

  /** Aggregate a column of xxhash64 values into a serialized bloom
    * filter (one binary cell). `expectedItems` sizes the filter
    * (~1.2 bytes/item at the default 3% fpp ceiling). */
  def bloomFilterAgg(hashed: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expr(hashed), expectedItems)
        .toAggregateExpression())

  /** Probe: true if `hashed` may be in the serialized filter (false ⇒
    * definitely absent — the side with no error). */
  def bloomMightContain(bloom: Column, hashed: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(ColumnBridge.expr(bloom), ColumnBridge.expr(hashed)))

  /** Build a bloom over `buildKeys` (collected to the driver — the same
    * single-row scalar Catalyst's runtime filters materialize) and
    * return it as a literal Column for probe-side pruning. The filter is
    * KB-to-MB scale for realistic build sides; the probe side never
    * moves. */
  def buildBloom(build: DataFrame, key: Column, expectedItems: Long): Column = {
    val bytes = build
      .agg(bloomFilterAgg(xxhash64(key), expectedItems).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    lit(bytes)
  }
}
