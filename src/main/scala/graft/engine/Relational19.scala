package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Twenty-seventh query wave: two more classic TPC-H join topologies —
  * the grouped-HAVING semi-join (Q18) and the anti-join-filtered
  * distinct count (Q16) — completing the Q3/Q5/Q8 family (q180, q135,
  * q138).
  */
object Relational19 {

  /** Q18's HAVING threshold, scaled to this corpus' ~4 lineitems per
    * order (the official 300 would select nothing). */
  val LargeQty = 120L

  /** q192 — TPC-H Q18 (large-volume customer): orders whose TOTAL
    * lineitem quantity exceeds a threshold, with customer context and
    * the quantity itself. The topology of interest: a grouped HAVING
    * over the fact table becomes the SEMI side that gates the
    * fact-dimension join — aggregate FIRST (map-side combinable, one
    * shuffle on orderkey), then join the tiny qualifying set to orders
    * and customers; the naive plan joins everything first and
    * aggregates the blow-up. Quantity rides the cents grid (quantities
    * are x.0 doubles; the grid makes the HAVING exact). Top 10 by
    * quantity, orderkey tie-break. */
  def q192LargeVolume(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val qty = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(expr(
        "sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) div 100")
        .as("qty"))
      .filter($"qty" > LargeQty)
    qty
      .join(Tables.orders(spark, sfDir),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"l_orderkey".as("orderkey"),
        Exact.tsString($"o_orderdate").as("o_orderdate"),
        Exact.cents($"o_totalprice").as("totalprice_cents"), $"qty")
      .orderBy($"qty".desc, $"orderkey")
      .limit(10)
  }

  def q192Sql: String =
    s"""WITH qty AS (
          SELECT l_orderkey,
            CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
              // 100 AS BIGINT) AS qty
          FROM lineitem GROUP BY 1
          HAVING CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
            AS BIGINT)) // 100 AS BIGINT) > $LargeQty)
        SELECT c_custkey, l_orderkey AS orderkey,
          strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS totalprice_cents,
          qty
        FROM qty
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY qty DESC, orderkey LIMIT 10"""

  /** q193 — the TPC-H Q16 topology (parts/supplier relationship): per
    * part attribute group (brand, type-prefix, size), how many DISTINCT
    * suppliers offer such parts — EXCLUDING an undesirable supplier set
    * (here: suppliers with account balance under $2000 — the fixture's
    * stand-in for Q16's complaint filter, chosen to be non-empty at
    * every SF). The shapes under test:
    * (a) a LEFT ANTI join removing the excluded suppliers BEFORE the
    * distinct count (never a NOT IN subquery — null-hostile and
    * unplannable at scale), and (b) a count(DISTINCT) whose dedup rides
    * the same shuffle as the group (partial aggregation on the compound
    * key). The anti side is an aggregate small enough to broadcast; at
    * scale it stays a broadcast while the part-supplier pairs shuffle
    * once. Top 12 groups by supplier count. */
  def q193SupplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bad = Tables.supplier(spark, sfDir)
      .filter($"s_acctbal" < 2000).select($"s_suppkey".as("l_suppkey"))
    val ps = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(bad, Seq("l_suppkey"), "left_anti")
    ps.join(Tables.part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .select($"p_brand",
        substring($"p_type", 1, 6).as("type_prefix"), $"p_size",
        $"l_suppkey")
      .groupBy($"p_brand", $"type_prefix", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"type_prefix", $"p_size")
      .limit(12)
  }

  def q193Sql: String =
    """WITH bad AS (
         SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000),
       ps AS (
         SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
         WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad))
       SELECT p_brand, substr(p_type, 1, 6) AS type_prefix, p_size,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       FROM ps JOIN part ON l_partkey = p_partkey
       GROUP BY 1, 2, 3
       ORDER BY supplier_cnt DESC, p_brand, type_prefix, p_size
       LIMIT 12"""

  /** q196 — the TPC-H Q21 topology (suppliers who kept orders waiting):
    * count, per supplier, the problem lineitems (this fixture has no
    * receipt/commit dates, so `l_returnflag = 'R'` is the problem
    * marker — the topology is unchanged) inside 'F'-status orders that
    * involve ANOTHER supplier (correlated EXISTS self-join) where NO
    * other supplier had a problem item (correlated NOT EXISTS
    * self-join). The double-correlated pair is the shape nothing else
    * in the q135/q138/q180/q192/q193 family exercises — and the
    * engine-friendly plan answers BOTH arms with ONE orderkey
    * aggregation instead of two lineitem self-joins:
    * `n_supp > 1` ⇔ the EXISTS arm, and `n_marked_supp = 1` (the
    * probe row itself being marked) ⇔ the NOT-EXISTS arm — so
    * lineitem shuffles on orderkey once for the aggregate and once for
    * the probe join (same key: the exchange is reusable), never
    * quadratically. Supplier×nation is a broadcast dimension. The
    * oracle keeps the textbook EXISTS/NOT-EXISTS form, proving the
    * rewrite. */
  def q196WaitingSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", ($"l_returnflag" === "R").as("marked"))
    val perOrder = li.groupBy($"l_orderkey")
      .agg(countDistinct($"l_suppkey").as("n_supp"),
        countDistinct(when($"marked", $"l_suppkey")).as("n_marked_supp"))
      .filter($"n_supp" > 1 && $"n_marked_supp" === 1)
      .select($"l_orderkey")
    val fOrders = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    val sup = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name")
    li.filter($"marked")
      .join(perOrder, Seq("l_orderkey"))
      .join(fOrders, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  def q196Sql: String =
    """SELECT s.s_name AS s_name, CAST(count(*) AS BIGINT) AS numwait
       FROM supplier s
       JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
       JOIN orders o ON o.o_orderkey = l1.l_orderkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
                     WHERE l3.l_orderkey = l1.l_orderkey
                       AND l3.l_suppkey <> l1.l_suppkey
                       AND l3.l_returnflag = 'R')
       GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100"""
}
