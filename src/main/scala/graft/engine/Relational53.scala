package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventy-second query wave: q349 Benford first-digit audit (the
  * classic fraud/synthetic-data screen), q350 inclusion-dependency
  * discovery (cross-table foreign-key candidate detection — the
  * data-discovery complement to q345's within-table FDs), and q351
  * degree assortativity of the part co-order graph (do hub products
  * co-sell with hubs — one exact Pearson over the edge list).
  */
object Relational53 {

  /** q349 — BENFORD AUDIT: first-significant-digit distribution of
    * o_totalprice against Benford's law. Natural multiplicative data
    * follows P(d) = log10(1+1/d); synthetic or tampered columns
    * don't, which is why auditors run exactly this screen. The
    * expected permille weights are fixed integer literals (301, 176,
    * …, 46 — identical constants on both engines, so no transcendental
    * log parity risk); observed shares land on the same permille grid
    * via integer division. Emitted per digit: count, observed and
    * expected permille, absolute deviation.
    *
    * Scale: one projected scan folds to ≤ 9 digit groups map-side;
    * the total joins back as a broadcast scalar. The digit comes from
    * the cents grid's decimal string — leading-zero-free and
    * identical in both engines for positive BIGINTs. */
  def q349Benford(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val expected = Seq(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L,
      5 -> 79L, 6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L)
      .toDF("digit", "exp_permille")
    val byDigit = Tables.orders(spark, sfDir)
      .select(Exact.cents($"o_totalprice").as("cents"))
      .select(substring($"cents".cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy($"digit")
      .agg(count(lit(1)).as("n_orders"))
    val total = byDigit.agg(sum($"n_orders").as("total"))
    expected
      .join(byDigit, Seq("digit"), "left_outer")
      .na.fill(0L, Seq("n_orders"))
      .crossJoin(broadcast(total))
      .select($"digit", $"n_orders",
        expr("(1000 * n_orders) div total").as("obs_permille"),
        $"exp_permille")
      .withColumn("dev_permille",
        abs($"obs_permille" - $"exp_permille"))
      .orderBy($"digit")
  }

  def q349Sql: String =
    """WITH cents AS (
         SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS c
         FROM orders),
       by_digit AS (
         SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
           CAST(count(*) AS BIGINT) AS n_orders
         FROM cents GROUP BY 1),
       tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM by_digit),
       expected AS (
         SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97),
           (5, 79), (6, 67), (7, 58), (8, 51), (9, 46))
           AS e(digit, exp_permille))
       SELECT e.digit, coalesce(b.n_orders, 0) AS n_orders,
         (1000 * coalesce(b.n_orders, 0)) // t.total AS obs_permille,
         CAST(e.exp_permille AS BIGINT) AS exp_permille,
         abs((1000 * coalesce(b.n_orders, 0)) // t.total
           - e.exp_permille) AS dev_permille
       FROM expected e LEFT JOIN by_digit b ON e.digit = b.digit
       CROSS JOIN tot t
       ORDER BY e.digit"""

  /** q350 — INCLUSION-DEPENDENCY DISCOVERY: for a registry of
    * candidate (child.column → parent.column) pairs, measure how much
    * of the child's distinct value set the parent contains — the
    * profiling pass that proposes foreign keys on an undocumented
    * lake (Bauckmann et al.'s SPIDER problem, restated as Spark
    * joins). A pair is an FK candidate iff zero orphans. The registry
    * deliberately includes reversals (o_orderkey → l_orderkey) and
    * cross-domain long shots (user_id → c_custkey) so the query
    * demonstrates rejection, not just confirmation.
    *
    * Scale: each side folds to its DISTINCT key frame map-side
    * (partial aggregation) before the (pair, value)-keyed left join;
    * nothing row-scale ever joins row-scale. Adding a pair costs one
    * more projected column scan. */
  def q350InclusionDeps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def side(df: DataFrame, colName: String, pair: String): DataFrame =
      df.select(col(colName).cast("long").as("v"))
        .distinct()
        .select(lit(pair).as("pair"), $"v")
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    val e = Tables.events(spark, sfDir)
    val d = Tables.documents(spark, sfDir)
    val m = Tables.embeddings(spark, sfDir)
    val pairs: Seq[(String, DataFrame, String, DataFrame, String)] = Seq(
      ("o_custkey->c_custkey", o, "o_custkey", c, "c_custkey"),
      ("l_orderkey->o_orderkey", l, "l_orderkey", o, "o_orderkey"),
      ("l_partkey->p_partkey", l, "l_partkey", p, "p_partkey"),
      ("l_suppkey->s_suppkey", l, "l_suppkey", s, "s_suppkey"),
      ("c_nationkey->n_nationkey", c, "c_nationkey", n, "n_nationkey"),
      ("s_nationkey->n_nationkey", s, "s_nationkey", n, "n_nationkey"),
      ("n_regionkey->r_regionkey", n, "n_regionkey", r, "r_regionkey"),
      ("o_orderkey->l_orderkey", o, "o_orderkey", l, "l_orderkey"),
      ("vec_id->doc_id", m, "vec_id", d, "doc_id"),
      ("user_id->c_custkey", e, "user_id", c, "c_custkey"))
    val lhs = pairs.map { case (nm, ldf, lc, _, _) => side(ldf, lc, nm) }
      .reduce(_.unionAll(_))
    val rhs = pairs.map { case (nm, _, _, rdf, rc) => side(rdf, rc, nm) }
      .reduce(_.unionAll(_))
      .withColumn("hit", lit(1L))
    lhs.join(rhs, Seq("pair", "v"), "left_outer")
      .groupBy($"pair")
      .agg(count(lit(1)).as("n_distinct"),
        coalesce(sum(when($"hit".isNull, 1L)), lit(0L)).as("n_orphan"))
      .select($"pair", $"n_distinct", $"n_orphan",
        expr("(1000 * (n_distinct - n_orphan)) div n_distinct")
          .as("contained_permille"),
        when($"n_orphan" === 0L, 1L).otherwise(0L).as("is_fk_candidate"))
      .orderBy($"pair")
  }

  def q350Sql: String = {
    val pairs = Seq(
      ("o_custkey->c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
      ("l_orderkey->o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("l_partkey->p_partkey", "lineitem", "l_partkey", "part", "p_partkey"),
      ("l_suppkey->s_suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("c_nationkey->n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("s_nationkey->n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("n_regionkey->r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
      ("o_orderkey->l_orderkey", "orders", "o_orderkey", "lineitem", "l_orderkey"),
      ("vec_id->doc_id", "embeddings", "vec_id", "documents", "doc_id"),
      ("user_id->c_custkey", "events", "user_id", "customer", "c_custkey"))
    val lhs = pairs.map { case (nm, lt, lc, _, _) =>
      s"SELECT '$nm' AS pair, CAST($lc AS BIGINT) AS v FROM $lt GROUP BY 1, 2"
    }.mkString("\n         UNION ALL ")
    val rhs = pairs.map { case (nm, _, _, rt, rc) =>
      s"SELECT '$nm' AS pair, CAST($rc AS BIGINT) AS v FROM $rt GROUP BY 1, 2"
    }.mkString("\n         UNION ALL ")
    s"""WITH lhs AS (
         $lhs),
       rhs AS (
         $rhs),
       j AS (
         SELECT lhs.pair, lhs.v,
           CASE WHEN rhs.v IS NULL THEN 1 ELSE 0 END AS orphan
         FROM lhs LEFT JOIN rhs ON lhs.pair = rhs.pair AND lhs.v = rhs.v)
       SELECT pair, CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(orphan) AS BIGINT) AS n_orphan,
         CAST((1000 * (count(*) - sum(orphan))) // count(*) AS BIGINT)
           AS contained_permille,
         CAST(CASE WHEN sum(orphan) = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS is_fk_candidate
       FROM j GROUP BY pair ORDER BY pair"""
  }

  /** q351 — DEGREE ASSORTATIVITY of the part co-order graph: do
    * high-degree parts co-occur with other hubs (r > 0, social-style)
    * or with leaves (r < 0, technological-style)? Newman's r is the
    * Pearson correlation of endpoint degrees over the directed edge
    * list; with each undirected edge counted in both directions the
    * two marginals coincide, so r = (n·Σxy − (Σx)²)/(n·Σx² − (Σx)²)
    * — a ratio of two exact BIGINTs, emitted alongside the sufficient
    * statistics. The final double is one exact-operand IEEE division,
    * bit-identical across engines.
    *
    * Scale: edges come from the lineitem self-join co-partitioned on
    * l_orderkey (per-order line counts are bounded, so the per-key
    * pair fan-out is too); the distinct-pair fold and the two
    * degree-lookup joins key on parts — AQE broadcasts the degree
    * frame while it fits, plain shuffle join beyond. The BIGINT
    * products hold to ~sf100; past that, pre-fold the directed edges
    * to a (x, y, cnt) degree-pair frame before the moment sums. */
  def q351Assortativity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
      .distinct()
    val edges = li.as("a")
      .join(li.as("b"), $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
      .select($"a.pk".as("u"), $"b.pk".as("v"))
      .distinct()
    val deg = edges.select($"u".as("node"))
      .unionAll(edges.select($"v".as("node")))
      .groupBy($"node")
      .agg(count(lit(1)).as("deg"))
    val directed = edges.select($"u".as("src"), $"v".as("dst"))
      .unionAll(edges.select($"v".as("src"), $"u".as("dst")))
    val stats = directed
      .join(deg.select($"node".as("src"), $"deg".as("x")), Seq("src"))
      .join(deg.select($"node".as("dst"), $"deg".as("y")), Seq("dst"))
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
    stats.select($"n", $"sx", $"sxy", $"sxx",
      ($"n" * $"sxy" - $"sx" * $"sx").as("r_num"),
      ($"n" * $"sxx" - $"sx" * $"sx").as("r_den"))
      .withColumn("assortativity",
        $"r_num".cast("double") / $"r_den".cast("double"))
  }

  def q351Sql: String =
    """WITH li AS (
         SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       edges AS (
         SELECT DISTINCT a.pk AS u, b.pk AS v
         FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
       deg AS (
         SELECT node, CAST(count(*) AS BIGINT) AS deg
         FROM (SELECT u AS node FROM edges
               UNION ALL SELECT v FROM edges)
         GROUP BY node),
       directed AS (
         SELECT u AS src, v AS dst FROM edges
         UNION ALL SELECT v, u FROM edges),
       stats AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(dx.deg) AS BIGINT) AS sx,
           CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sxy,
           CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sxx
         FROM directed d
         JOIN deg dx ON d.src = dx.node
         JOIN deg dy ON d.dst = dy.node)
       SELECT n, sx, sxy, sxx,
         n * sxy - sx * sx AS r_num,
         n * sxx - sx * sx AS r_den,
         CAST(n * sxy - sx * sx AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS assortativity
       FROM stats"""
}
