package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fiftieth query wave (round 9, session 2): the three classic TPC-H
  * decision-support shapes the batch set did not yet exercise —
  * EXISTS-driven priority auditing (Q4), conditional two-class
  * latency classification (Q12), and the nested dominant-share
  * aggregation (Q20) — each adapted to the fixture schema (no
  * commitdate/receiptdate/shipmode/partsupp columns exist here, so
  * the predicates derive the same shapes from shipdate latency and
  * shipped-quantity dominance).
  *
  * Reference behavior anchor: the reference's batch aggregations
  * (spark-app/src/main/scala/streamingConsumer/consumer.scala's
  * grouped counts) never reach subquery shapes; these extend the
  * engine to the full decision-support tier a warehouse user expects.
  */
object Relational35 {

  /** q294 — LATE-ORDER PRIORITY AUDIT (TPC-H Q4 shape): for orders
    * placed in 1996, count per priority the orders with at least one
    * lineitem shipped more than 60 days after the order date — the
    * EXISTS/semi-join form: each qualifying order counts ONCE no
    * matter how many late lines it has.
    *
    * Scale: orders prunes to (key, date, priority) at the scan
    * (PushedFilters on o_orderdate); lineitem prunes to (key, date);
    * the LeftSemi equi-join on orderkey carries the latency predicate
    * as a residual, so no fan-out ever materializes and the semi
    * short-circuits per probe row. Both sides shuffle on orderkey —
    * at cluster scale this is the bucketed-join key (q116's layout). */
  def q294LateOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_shipdate")
    o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy($"o_orderpriority")
  }

  def q294Sql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
       FROM orders o
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate <  TIMESTAMP '1997-01-01'
         AND EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
             AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** q295 — SHIPPING-LATENCY CLASS REPORT (TPC-H Q12 shape): lines
    * shipped in 1996 classified by ship latency (fast <30d, medium
    * 30–89d, slow ≥90d), with the Q12 conditional two-class split:
    * how many lines in each latency class belong to high-priority
    * orders (1-URGENT/2-HIGH) vs low — the conditional-sum form, one
    * pass, no second grouping.
    *
    * Scale: the latency needs o_orderdate, so lineitem joins orders
    * on orderkey — both sides projected to ≤3 columns before the
    * shuffle; the classification and both conditional counts fold
    * into one hash aggregate over a 3-row frame. */
  def q295LatencyClasses(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .select($"l_orderkey", $"l_shipdate", $"l_quantity")
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .withColumn("lat", datediff(to_date($"l_shipdate"), to_date($"o_orderdate")))
      .withColumn("lat_class",
        when($"lat" >= 90, "slow").when($"lat" >= 30, "medium").otherwise("fast"))
      .groupBy($"lat_class")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_lines"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_lines"),
        sum($"l_quantity".cast("long")).as("sum_qty"))
      .orderBy($"lat_class")
  }

  def q295Sql: String =
    """SELECT
         CASE WHEN lat >= 90 THEN 'slow'
              WHEN lat >= 30 THEN 'medium' ELSE 'fast' END AS lat_class,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                       THEN 0 ELSE 1 END) AS BIGINT) AS low_lines,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       FROM (
         SELECT o_orderpriority, l_quantity,
           CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS lat
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01')
       GROUP BY 1 ORDER BY lat_class"""

  /** q296 — DOMINANT-SUPPLIER PARTS (TPC-H Q20 shape): among widget
    * parts, a supplier DOMINATES a part when its shipped quantity is
    * strictly more than TWICE the part's mean per-supplier quantity
    * (qty · n_suppliers > 2 · total — Q20's "more than half the
    * availability" test recast against the fixture's uniform supplier
    * fan-out, where no supplier ever holds an absolute majority);
    * report each supplier holding at least one dominant part with its
    * nation, how many parts it dominates, and the dominated quantity
    * — the nested-aggregate + join-back form (per-pair agg, per-part
    * re-agg, share filter, per-supplier rollup).
    *
    * Scale: both aggregates and the join-back hash on l_partkey, so
    * the per-part total join is CO-PARTITIONED with the pair frame —
    * one shuffle serves all three steps (visible in the plan as a
    * single Exchange before the join). part and the supplier/nation
    * dims ride broadcasts. */
  def q296DominantSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val widgets = Tables.part(spark, sfDir)
      .filter($"p_name".endsWith("widget")).select($"p_partkey")
    val pairs = Tables.lineitem(spark, sfDir)
      .join(broadcast(widgets), $"l_partkey" === $"p_partkey")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast("long")).as("qty"))
    val totals = pairs.groupBy($"l_partkey")
      .agg(sum($"qty").as("tot"), count(lit(1)).as("ns"))
    val dominant = pairs.join(totals, Seq("l_partkey"))
      .filter($"qty" * $"ns" > $"tot" * 2)
    val perSupp = dominant.groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_dominant_parts"), sum($"qty").as("dom_qty"))
    perSupp
      .join(broadcast(Tables.supplier(spark, sfDir)),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, sfDir)),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_name", $"n_name", $"n_dominant_parts", $"dom_qty")
      .orderBy($"s_name")
  }

  def q296Sql: String =
    """WITH pairs AS (
         SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_name LIKE '%widget'
         GROUP BY 1, 2),
       totals AS (
         SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS tot,
           CAST(count(*) AS BIGINT) AS ns
         FROM pairs GROUP BY 1),
       dominant AS (
         SELECT p.l_suppkey, p.qty
         FROM pairs p JOIN totals t USING (l_partkey)
         WHERE p.qty * t.ns > t.tot * 2)
       SELECT s_name, n_name,
         CAST(count(*) AS BIGINT) AS n_dominant_parts,
         CAST(sum(qty) AS BIGINT) AS dom_qty
       FROM dominant
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       GROUP BY s_name, n_name ORDER BY s_name"""
}
