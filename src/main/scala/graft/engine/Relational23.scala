package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-first query wave: the remaining classic TPC-H join
  * topologies (Q2, Q11, Q13, Q17, Q20, Q22, Q7, Q19), adapted to this
  * corpus's reduced schema (no partsupp table — lineitem stands in as
  * the part×supplier relation where needed). Together with
  * q135/q138/q180/q192/q193/q196 this completes every distinct TPC-H
  * join/agg shape expressible over the available tables.
  *
  * Shared conventions: money on the integer-cents grid (Exact.cents),
  * revenue on the DECIMAL(18,4) grid (q12/q135 recipe), thresholds as
  * integer cross-multiplications (never a double division on the
  * comparison path), and a total ORDER BY on every output.
  */
object Relational23 {

  val Q211Region = "EUROPE"
  val Q211Type = "STANDARD"
  val Q211MaxSize = 5

  /** q211 — TPC-H Q2 topology (min-cost supplier per part). With no
    * partsupp table, supply cost per (part, supplier) is the minimum
    * observed sale price in lineitem. Per qualifying part (small
    * STANDARD parts), keep only the EUROPE suppliers achieving the
    * part's regional minimum cost.
    *
    * Scale: the only big-data shuffle is the (partkey, suppkey)
    * aggregate over lineitem; part/supplier/nation/region are all
    * broadcast, and the per-part minimum is a window over the already
    * partkey-clustered aggregate (one further shuffle on partkey,
    * ~|part| rows, not |lineitem|). The correlated-min of Q2 becomes a
    * rank filter — no re-join of the fact table. */
  def q211MinCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val costs = Tables.lineitem(spark, sfDir)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min(Exact.cents($"l_extendedprice")).as("cost_cents"))
    val parts = Tables.part(spark, sfDir)
      .filter($"p_type" === Q211Type && $"p_size" <= Q211MaxSize)
      .select($"p_partkey", $"p_name")
    val supps = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, sfDir).filter($"r_name" === Q211Region),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    costs
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(supps), $"l_suppkey" === $"s_suppkey")
      .withColumn("min_cost",
        min($"cost_cents").over(Window.partitionBy($"p_partkey")))
      .filter($"cost_cents" === $"min_cost")
      .select(Exact.cents($"s_acctbal").as("acctbal_cents"),
        $"s_name", $"n_name", $"p_partkey", $"p_name", $"cost_cents")
      .orderBy($"acctbal_cents".desc, $"s_name", $"p_partkey")
  }

  def q211Sql: String =
    s"""WITH costs AS (
          SELECT l_partkey, l_suppkey,
            min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS cost_cents
          FROM lineitem GROUP BY 1, 2),
        supps AS (
          SELECT s_suppkey, s_name, s_acctbal, n_name
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = '$Q211Region'),
        j AS (
          SELECT p_partkey, p_name, s_name, s_acctbal, n_name, cost_cents,
            min(cost_cents) OVER (PARTITION BY p_partkey) AS min_cost
          FROM costs
          JOIN part ON l_partkey = p_partkey
          JOIN supps ON l_suppkey = s_suppkey
          WHERE p_type = '$Q211Type' AND p_size <= $Q211MaxSize)
        SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS acctbal_cents,
          s_name, n_name, p_partkey, p_name, cost_cents
        FROM j WHERE cost_cents = min_cost
        ORDER BY acctbal_cents DESC, s_name, p_partkey"""

  val Q212Region = "ASIA"
  val Q212ShareDen = 1000L // keep parts with > 1/1000 of total value

  /** q212 — TPC-H Q11 topology (important stock): per-part sale value
    * restricted to one region's suppliers, keeping parts whose value
    * exceeds a fixed fraction of the GLOBAL total — the
    * scalar-subquery-in-HAVING shape. The threshold compare is the
    * integer cross-multiplication `value * den > total`, never a
    * double division.
    *
    * Scale: one fact shuffle on l_partkey; the global total is a
    * second aggregation of the ALREADY-aggregated per-part frame
    * (|part| rows) broadcast back as a 1-row scalar — the fact table
    * is scanned once. */
  def q212ImportantParts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val supps = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), $"s_nationkey" === $"n_nationkey")
      .join(Tables.region(spark, sfDir).filter($"r_name" === Q212Region),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey")
    val value = Tables.lineitem(spark, sfDir)
      .join(broadcast(supps), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey")
      .agg(sum(Exact.cents($"l_extendedprice")).as("value_cents"))
    val total = value.agg(sum($"value_cents").as("total_cents"))
    value.crossJoin(broadcast(total))
      .filter($"value_cents" * Q212ShareDen > $"total_cents")
      .select($"l_partkey".as("p_partkey"), $"value_cents")
      .orderBy($"value_cents".desc, $"p_partkey")
  }

  def q212Sql: String =
    s"""WITH value AS (
          SELECT l_partkey AS p_partkey,
            CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
              AS BIGINT)) AS BIGINT) AS value_cents
          FROM lineitem
          WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = '$Q212Region')
          GROUP BY 1)
        SELECT p_partkey, value_cents FROM value
        WHERE value_cents * $Q212ShareDen >
          (SELECT sum(value_cents) FROM value)
        ORDER BY value_cents DESC, p_partkey"""

  val Q213ExcludePrio = "1-URGENT"

  /** q213 — TPC-H Q13 (customer order-count distribution): LEFT OUTER
    * join customer→filtered-orders so zero-order customers survive
    * with c_count = 0, then aggregate the aggregate — the distribution
    * of per-customer counts. Nothing else in the suite groups on an
    * aggregated value.
    *
    * Scale: shuffle orders on o_custkey once (|orders|); the second
    * aggregate runs over |distinct counts| ≈ dozens of rows. The outer
    * join keeps customer as the left (preserved) side so Spark can
    * still shuffle-hash it; no driver materialization. */
  def q213CustDist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" =!= Q213ExcludePrio)
      .select($"o_orderkey", $"o_custkey")
    Tables.customer(spark, sfDir).select($"c_custkey")
      .join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  def q213Sql: String =
    s"""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
          SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer
          LEFT JOIN (SELECT * FROM orders
                     WHERE o_orderpriority <> '$Q213ExcludePrio') o
            ON c_custkey = o_custkey
          GROUP BY 1)
        GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""

  val Q214Brands: Seq[String] = Seq("Brand#1", "Brand#2", "Brand#3")

  /** q214 — TPC-H Q17 topology (small-quantity-order revenue): revenue
    * from lineitem rows whose quantity is below 20% of the part's
    * average quantity, per brand. The correlated AVG subquery becomes
    * a window over the partkey partition, and the `qty < 0.2 * avg`
    * compare is the exact integer form `5 * qty * n < sum` — no
    * division anywhere.
    *
    * Scale: ONE shuffle of the brand-filtered fact slice on partkey
    * serves both the per-part stats (window) and the row filter —
    * Q17's classic double-scan/self-join is avoided entirely. */
  def q214SmallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, sfDir)
      .filter($"p_brand".isin(Q214Brands: _*))
      .select($"p_partkey", $"p_brand")
    val w = Window.partitionBy($"p_partkey")
    Tables.lineitem(spark, sfDir)
      .select($"l_partkey", Exact.cents($"l_quantity").as("qc"),
        Exact.cents($"l_extendedprice").as("ec"))
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sq", sum($"qc").over(w))
      .filter($"qc" * 5 * $"n" < $"sq")
      .groupBy($"p_brand")
      .agg(sum($"ec").as("rev_cents"), count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  def q214Sql: String =
    s"""WITH j AS (
          SELECT p_brand,
            CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS ec,
            CAST(count(*) OVER (PARTITION BY l_partkey) AS BIGINT) AS n,
            CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
              OVER (PARTITION BY l_partkey) AS BIGINT) AS sq
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_brand IN (${Q214Brands.map(b => s"'$b'").mkString(", ")}))
        SELECT p_brand, CAST(sum(ec) AS BIGINT) AS rev_cents,
          CAST(count(*) AS BIGINT) AS n_lines
        FROM j WHERE qc * 5 * n < sq
        GROUP BY 1 ORDER BY p_brand"""

  val Q215Prefix = "red "
  val Q215MaxNation = 13
  val Q215ShareMul = 10L // qualify pairs carrying > 1/10 of the part total

  /** q215 — TPC-H Q20 topology (nested semi-join chain): suppliers in
    * low-numbered nations who shipped a 'red *' part AND carried more
    * than 10% of that part's total shipped quantity. parts→pairs is a
    * broadcast semi, the 10%-share test is the integer form
    * `10 * pair > total` over a partkey window, and the final step is a
    * genuine LEFT SEMI against the qualifying supplier set.
    *
    * Scale: the prefix filter shrinks the fact slice before its one
    * (suppkey, partkey) shuffle; the window reuses that clustering.
    * The semi join probes supplier (small) against the distinct
    * qualifying suppkeys — no fact re-scan. */
  def q215QualifiedSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val prefixParts = Tables.part(spark, sfDir)
      .filter($"p_name".startsWith(Q215Prefix))
      .select($"p_partkey")
    val pairs = Tables.lineitem(spark, sfDir)
      .join(broadcast(prefixParts), $"l_partkey" === $"p_partkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(Exact.cents($"l_quantity")).as("pair_q"))
      .withColumn("tot_q",
        sum($"pair_q").over(Window.partitionBy($"l_partkey")))
      .filter($"pair_q" * Q215ShareMul > $"tot_q")
      .select($"l_suppkey")
    Tables.supplier(spark, sfDir)
      .filter($"s_nationkey" < Q215MaxNation)
      .join(pairs, $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_name", Exact.cents($"s_acctbal").as("acctbal_cents"))
      .orderBy($"s_name")
  }

  def q215Sql: String =
    s"""WITH pairs AS (
          SELECT l_suppkey, l_partkey,
            CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS pair_q
          FROM lineitem
          WHERE l_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE '$Q215Prefix%')
          GROUP BY 1, 2),
        qual AS (
          SELECT l_suppkey FROM (
            SELECT l_suppkey, pair_q,
              sum(pair_q) OVER (PARTITION BY l_partkey) AS tot_q
            FROM pairs)
          WHERE pair_q * $Q215ShareMul > tot_q)
        SELECT s_name,
          CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS acctbal_cents
        FROM supplier
        WHERE s_nationkey < $Q215MaxNation
          AND s_suppkey IN (SELECT l_suppkey FROM qual)
        ORDER BY s_name"""

  val Q216Segments: Seq[String] = Seq("AUTOMOBILE", "BUILDING", "FURNITURE")
  val Q216AntiPrio = "1-URGENT"

  /** q216 — TPC-H Q22 topology (global-average threshold + anti join):
    * customers in target segments whose balance exceeds the average
    * positive balance across those segments AND who never placed an
    * URGENT-priority order (every customer in this corpus has SOME
    * order, so Q22's literal no-orders arm would be vacuous — the
    * priority-scoped anti join keeps the topology AND a non-trivial
    * result). The scalar-average threshold is the exact integer
    * cross-multiplication `bal * n > total` (both engines compare
    * exact BIGINTs — no borderline-row divergence from avg()'s
    * summation order), and the no-urgent-orders arm is a genuine
    * LEFT ANTI.
    *
    * Scale: customer aggregates to a broadcast 1-row scalar; the anti
    * join shuffles on custkey — orders' o_custkey projection is the
    * only fact-sized movement. */
  def q216RichInactive(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_mktsegment".isin(Q216Segments: _*))
      .select($"c_custkey", $"c_mktsegment",
        Exact.cents($"c_acctbal").as("bal"))
    val pos = cust.filter($"bal" > 0)
      .agg(sum($"bal").as("tot"), count(lit(1)).as("n"))
    cust.crossJoin(broadcast(pos))
      .filter($"bal" * $"n" > $"tot")
      .join(Tables.orders(spark, sfDir)
          .filter($"o_orderpriority" === Q216AntiPrio).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_cust"), sum($"bal").as("total_bal_cents"))
      .orderBy($"c_mktsegment")
  }

  def q216Sql: String =
    s"""WITH cust AS (
          SELECT c_custkey, c_mktsegment,
            CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal
          FROM customer
          WHERE c_mktsegment IN
            (${Q216Segments.map(x => s"'$x'").mkString(", ")})),
        pos AS (
          SELECT CAST(sum(bal) AS BIGINT) AS tot,
            CAST(count(*) AS BIGINT) AS n
          FROM cust WHERE bal > 0)
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust,
          CAST(sum(bal) AS BIGINT) AS total_bal_cents
        FROM cust, pos
        WHERE bal * n > tot
          AND c_custkey NOT IN (SELECT o_custkey FROM orders
            WHERE o_orderpriority = '$Q216AntiPrio')
        GROUP BY 1 ORDER BY c_mktsegment"""

  // Chosen for BIDIRECTIONAL cross-traffic at every fixture SF (verified
  // in DuckDB against sf0.001/0.01/0.1): the round-6 regenerated data
  // left NATION_0↔NATION_1 with zero cross-pairs at sf0.001, which made
  // the q217 spec's nonEmpty assertion fixture-dependent.
  val Q217NationA = "NATION_12"
  val Q217NationB = "NATION_13"

  /** q217 — TPC-H Q7 topology (volume shipping between two nations):
    * revenue by (supplier nation, customer nation, ship year) for
    * flows in either direction between two nations. Exercises the
    * double-dimension join where the SAME dimension (nation) binds to
    * two different fact foreign keys with a disjunctive cross-pair
    * predicate.
    *
    * Scale: both nation binds are broadcasts of a 2-row frame with the
    * pair filter applied BEFORE the fact joins (semi-selective
    * supplier/customer reductions), so the lineitem→orders shuffle is
    * the only fact-sized exchange; revenue rides the DECIMAL(18,4)
    * grid. */
  def q217VolumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nations = Tables.nation(spark, sfDir)
      .filter($"n_name".isin(Q217NationA, Q217NationB))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nations), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nations), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey", year($"l_shipdate").as("l_year"),
        ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,4)").as("rev"))
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(Exact.decToDouble(sum($"rev"), 4).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  def q217Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,4))) * 10000 AS BIGINT) / 10000.0 AS revenue,
          CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name IN ('$Q217NationA', '$Q217NationB')
          AND cn.n_name IN ('$Q217NationA', '$Q217NationB')
          AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year"""

  /** q218 — TPC-H Q19 topology (disjunctive multi-attribute join
    * predicate): revenue over an OR of three (brand, size-range,
    * quantity-range) conjunction arms spanning BOTH join sides.
    * Exercises Catalyst's handling of disjunctions that cannot be
    * pushed below the join as a whole — the per-side common residues
    * (`p_size >= 1`, quantity bounds) still prune before the join.
    *
    * Scale: part is broadcast; the disjunction is evaluated inside the
    * broadcast-hash-join row loop (codegen'd), so the fact table
    * streams through once with zero shuffles. */
  def q218DisjunctiveRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_quantity",
        ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,4)").as("rev"))
    val p = Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_brand", $"p_size")
    val arm1 = $"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
      $"l_quantity".between(1, 11)
    val arm2 = $"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
      $"l_quantity".between(10, 20)
    val arm3 = $"p_brand" === "Brand#24" && $"p_size".between(1, 15) &&
      $"l_quantity".between(20, 30)
    li.join(broadcast(p),
        $"l_partkey" === $"p_partkey" && (arm1 || arm2 || arm3))
      .groupBy($"p_brand")
      .agg(Exact.decToDouble(sum($"rev"), 4).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  def q218Sql: String =
    """SELECT p_brand,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
           AS DECIMAL(18,4))) * 10000 AS BIGINT) / 10000.0 AS revenue,
         CAST(count(*) AS BIGINT) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 20 AND 30)
       GROUP BY 1 ORDER BY p_brand"""
}
