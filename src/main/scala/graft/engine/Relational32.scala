package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-second query wave: exact distributed quantiles via the
  * value-domain histogram (q275), and the two classic correlated-
  * subquery decorrelation shapes — multi-EXISTS (q277, the TPC-H Q21
  * form) and scalar-subquery + anti-join (q278, the Q22 form) — that
  * exercise Catalyst's rewrite of EXISTS/NOT EXISTS/scalar subqueries
  * into semi/anti/broadcast joins. (q276, the streaming member of the
  * wave, lives in streaming/Streaming.scala.)
  *
  * House determinism rules: money on the cents grid, threshold
  * comparisons cross-multiplied in exact integers (no float compare
  * ever gates a row), ties broken by unique keys.
  */
object Relational32 {

  /** q275 — EXACT per-group quantiles (p50/p90/p99) from the VALUE
    * HISTOGRAM: the scale-safe alternative to sorting each group —
    * `cents` lives on a bounded integer domain, so one map-side-
    * combinable (type, cents) count aggregate collapses the corpus to
    * a histogram whose size is the DOMAIN (≤ |distinct cents|), a
    * cumulative count over that bounded frame locates each quantile,
    * and the p-quantile is the smallest cents whose running count
    * reaches ⌈p·n/100⌉ (type-1/discrete definition — pure integers,
    * no interpolation, no float rank arithmetic).
    *
    * Scale: the only data-volume shuffle is the histogram aggregate;
    * the window runs per event_type over a domain-bounded frame (the
    * q154 posture — grows with the VALUE DOMAIN, never the row
    * count). percentile_exact on a sorted group would single-thread
    * each group; this never sorts more than the histogram. */
  def q275ExactQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hist = Tables.events(spark, sfDir)
      .groupBy($"event_type", Exact.cents($"value").as("cents"))
      .agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy($"event_type").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy($"event_type")
    val withCum = hist
      .withColumn("cum", sum($"cnt").over(cum))
      .withColumn("n", sum($"cnt").over(tot))
    val ps = Seq(50, 90, 99).toDF("p")
    withCum.join(broadcast(ps),
        // smallest cents with cum ≥ ⌈p·n/100⌉ — integer threshold
        $"cum" >= expr("(p * n + 99) div 100"))
      .groupBy($"event_type", $"p")
      .agg(min($"cents").as("q_cents"))
      .groupBy($"event_type")
      .pivot("p", Seq(50, 90, 99))
      .agg(first($"q_cents"))
      .select($"event_type", $"50".as("p50_cents"),
        $"90".as("p90_cents"), $"99".as("p99_cents"))
      .orderBy($"event_type")
  }

  def q275Sql: String =
    """WITH hist AS (
         SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY 1, 2),
       c AS (
         SELECT event_type, cents,
           sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
             ROWS UNBOUNDED PRECEDING) AS cum,
           sum(cnt) OVER (PARTITION BY event_type) AS n
         FROM hist),
       q AS (
         SELECT event_type, p, min(cents) AS q_cents
         FROM c CROSS JOIN (VALUES (50), (90), (99)) ps(p)
         WHERE cum >= (p * n + 99) // 100
         GROUP BY 1, 2)
       SELECT event_type,
         CAST(max(CASE WHEN p = 50 THEN q_cents END) AS BIGINT) AS p50_cents,
         CAST(max(CASE WHEN p = 90 THEN q_cents END) AS BIGINT) AS p90_cents,
         CAST(max(CASE WHEN p = 99 THEN q_cents END) AS BIGINT) AS p99_cents
       FROM q GROUP BY event_type ORDER BY event_type"""

  /** q277 — the TPC-H Q21 decorrelation shape on this catalog:
    * suppliers who were the SOLE 'R'-flagged (returned/late stand-in —
    * this lineitem has no receipt dates) line in a finished
    * multi-supplier order. Two correlated predicates per order:
    * EXISTS another supplier's line (the order had alternatives) and
    * NOT EXISTS another supplier's late line (everyone else
    * delivered). Catalyst decorrelates them to a LEFT SEMI and a LEFT
    * ANTI join on l_orderkey — set-membership joins that never
    * duplicate the probe side, the exact plan a hand-written
    * double-self-join would risk getting wrong on multiplicity.
    *
    * Scale: three shuffles on l_orderkey (semi, anti, and the base
    * filter join with orders) + one supplier-keyed count; no
    * correlated per-row subquery execution survives the rewrite. */
  def q277WaitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val finished = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "F").select($"o_orderkey")
    val late = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_suppkey")
      .join(finished, $"l_orderkey" === $"o_orderkey").drop("o_orderkey")
    val others = li.select($"l_orderkey".as("o_k"), $"l_suppkey".as("o_s"))
    val lateOthers = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey".as("a_k"), $"l_suppkey".as("a_s"))
    late
      .join(others,
        $"l_orderkey" === $"o_k" && $"l_suppkey" =!= $"o_s", "left_semi")
      .join(lateOthers,
        $"l_orderkey" === $"a_k" && $"l_suppkey" =!= $"a_s", "left_anti")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"l_suppkey")
      .limit(20)
  }

  def q277Sql: String =
    """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
       FROM lineitem l1
       JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
       WHERE l1.l_returnflag = 'R'
         AND EXISTS (
           SELECT 1 FROM lineitem l2
           WHERE l2.l_orderkey = l1.l_orderkey
             AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (
           SELECT 1 FROM lineitem l3
           WHERE l3.l_orderkey = l1.l_orderkey
             AND l3.l_suppkey <> l1.l_suppkey
             AND l3.l_returnflag = 'R')
       GROUP BY l_suppkey
       ORDER BY numwait DESC, l_suppkey LIMIT 20"""

  /** q278 — the TPC-H Q22 shape: per nation, the count and balance
    * mass of "idle rich" customers — above-average account balance
    * (scalar subquery over positive balances) in a target nation set,
    * with no BIG-TICKET order (anti join against the >$450k subset —
    * this fixture gives every customer some order, so the bite is on
    * order size, not existence). The above-average gate is
    * CROSS-MULTIPLIED in exact cents·count integers — no float
    * average ever gates a row, so both engines admit the identical
    * customer set bit-for-bit; only the reported balance sum is cast
    * at the end.
    *
    * Scale: the scalar aggregate broadcasts; the anti join shuffles on
    * custkey; the nation rollup is |nations|-sized. */
  def q278IdleRich(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_nationkey".isin(1, 5, 9, 13, 17, 21))
      .select($"c_custkey", $"c_nationkey", Exact.cents($"c_acctbal").as("bal"))
    val avgPos = cust.filter($"bal" > 0)
      .agg(sum($"bal").as("s"), count(lit(1)).as("c"))
    cust.crossJoin(broadcast(avgPos))
      .filter($"bal" * $"c" > $"s") // bal > s/c without the division
      // "never placed a big order" — every fixture customer has SOME
      // order, so the Q22 anti-join contract runs against the
      // big-ticket subset instead of all orders
      .join(Tables.orders(spark, sfDir)
          .filter($"o_totalprice" > 450000.0).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum($"bal").as("totbal_cents"))
      .orderBy($"c_nationkey")
  }

  def q278Sql: String =
    """WITH cust AS (
         SELECT c_custkey, c_nationkey,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
         FROM customer WHERE c_nationkey IN (1, 5, 9, 13, 17, 21)),
       a AS (
         SELECT CAST(sum(bal) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
         FROM cust WHERE bal > 0)
       SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
         CAST(sum(bal) AS BIGINT) AS totbal_cents
       FROM cust CROSS JOIN a
       WHERE bal * c > s
         AND NOT EXISTS (
           SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 450000)
       GROUP BY c_nationkey ORDER BY c_nationkey"""
}
