package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine bit-exact output casts for the oracle gate.
  *
  * A raw DECIMAL output column does NOT hash-match the DuckDB oracle even
  * when numerically equal: Spark's parquet decimal reads back (pandas) as
  * `Decimal('123.40')` while DuckDB's fetchdf yields float64 `123.4` —
  * the trailing-zero repr breaks value hashing. Likewise DuckDB returns
  * HUGEINT (→ float64) for integer SUMs, and Spark writes tz-aware UTC
  * timestamps where DuckDB yields naive ones.
  *
  * The portable recipe: compute the aggregate EXACTLY in decimal
  * (order-independent under shuffle), shift it to an integral BIGINT, and
  * perform one IEEE double division by 10^scale. Division of exact
  * operands is correctly rounded in both engines → identical bits, and
  * both sides read back as float64. Oracle twin:
  * `CAST(<decimal expr> * 10^s AS BIGINT) / 10^s.0`.
  */
object Exact {

  /** Decimal column (integral at `scale` digits) → bit-portable DOUBLE.
    *
    * DOMAIN: |c·10^scale| must fit in a signed 64-bit long. Outside it,
    * non-ANSI Spark's decimal→long cast wraps silently while DuckDB's
    * CAST raises — the oracle gate would catch the divergence, but the
    * Spark-side number would be garbage first. At 10^2 scale that bound
    * is ±9.2·10^16 of summed value — audit it before applying this
    * recipe to a new measure at 100 TB (or pre-aggregate per partition
    * key so no single sum approaches the bound). */
  def decToDouble(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale).toLong
    (c * p).cast("long") / lit(p.toDouble)
  }

  /** Order-exact SUM of a double column, emitted as a portable DOUBLE.
    *
    * DOMAIN — two bounds, the ELEMENT one being the tighter and easier
    * to miss: each input must satisfy |v| < 10^(18−scale) (the
    * per-element decimal(18,scale) cast; under ANSI — Spark 4's
    * default — an element outside it fails LOUDLY, but under ansi=off
    * it casts to NULL and sum() silently DROPS the row, a
    * plausible-looking wrong total), and the summed magnitude must fit
    * [[decToDouble]]'s |Σ·10^scale| < 2⁶³. Auditing only the summed
    * value misses the element class — check both. */
  def sumExact(c: Column, scale: Int): Column =
    decToDouble(sum(c.cast(s"decimal(18,$scale)")), scale)

  /** Double → exact integer CENTS (decimal-first, then shift) — the
    * load-bearing money/measure grid every integer-arithmetic query
    * shares (q55 arg-keys, q78 medians, q92 z-buckets, q108 fences).
    * Oracle twin: `CAST(CAST(c AS DECIMAL(18,2)) * 100 AS BIGINT)`.
    * DOMAIN: |c| < 10^16 per element (decimal(18,2)); ANSI fails loud,
    * ansi=off NULLs — the [[sumExact]] element-bound note applies. */
  def cents(c: Column): Column =
    (c.cast("decimal(18,2)") * 100).cast("long")

  /** Timestamp → second-truncated string; identical to DuckDB
    * `strftime(ts, '%Y-%m-%d %H:%M:%S')` and sorts chronologically. */
  def tsString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
