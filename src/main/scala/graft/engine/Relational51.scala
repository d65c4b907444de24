package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventieth query wave: q343 salted EXACT distinct (the two-level
  * rewrite that keeps a hot group's distinct set off a single final
  * task), q344 the KMV sketch accuracy frontier (estimate vs exact at
  * k = 8/32/128, one scan), and q345 functional-dependency discovery
  * (the |A| = |A,B| cardinality test over candidate column pairs —
  * schema profiling for free from one aggregate).
  */
object Relational51 {

  /** q343 — SALTED EXACT DISTINCT: distinct users per event type via
    * groupBy(type, user % 64) partial-distinct cells summed per type —
    * EXACT because each user lands in exactly one salt cell. The
    * direct `countDistinct` ships the hot type's whole distinct set
    * to ONE final task; the salted form spreads it over 64, which is
    * the difference between a working job and an OOM at a 100 TB hot
    * key. Both forms are emitted side by side so the gate itself
    * witnesses exactness.
    *
    * Scale: stage 1 is (type × 64)-cell distinct; stage 2 sums 64
    * bounded longs per type. */
  def q343SaltedDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir).select($"event_type", $"user_id")
    val salted = ev
      .groupBy($"event_type", ($"user_id" % 64).as("salt"))
      .agg(countDistinct($"user_id").as("nd"))
      .groupBy($"event_type")
      .agg(sum($"nd").as("n_users_salted"))
    val direct = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users_direct"))
    salted.join(direct, Seq("event_type"))
      .withColumn("exact_match", $"n_users_salted" === $"n_users_direct")
      .orderBy($"event_type")
  }

  def q343Sql: String =
    """WITH salted AS (
         SELECT event_type, CAST(sum(nd) AS BIGINT) AS n_users_salted
         FROM (
           SELECT event_type, user_id % 64 AS salt,
             count(DISTINCT user_id) AS nd
           FROM events GROUP BY 1, 2)
         GROUP BY 1),
       direct AS (
         SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_direct
         FROM events GROUP BY 1)
       SELECT event_type, n_users_salted, n_users_direct,
         n_users_salted = n_users_direct AS exact_match
       FROM salted JOIN direct USING (event_type)
       ORDER BY event_type"""

  private val KmvKs = Seq(8, 32, 128)

  /** q344 — KMV ACCURACY FRONTIER: the q127 sketch at k = 8, 32 and
    * 128 against the exact distinct, ONE scan — the accuracy-vs-state
    * table that justifies a k choice (state is k longs per group per
    * partition; the estimate error shrinks ~1/√k). Every estimate is
    * bit-reproducible (min-k hash sets are order-free), so the oracle
    * recomputes all three. */
  def q344KmvFrontier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hv = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id",
        conv(substring(md5($"user_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"))
    hv.groupBy($"event_type")
      .agg(
        graft.functions.KmvAggregate.kmvDistinct($"hv", KmvKs(0)).as("est_k8"),
        graft.functions.KmvAggregate.kmvDistinct($"hv", KmvKs(1)).as("est_k32"),
        graft.functions.KmvAggregate.kmvDistinct($"hv", KmvKs(2)).as("est_k128"),
        countDistinct($"user_id").as("n_exact"))
      .orderBy($"event_type")
  }

  def q344Sql: String = {
    val kth = KmvKs.map(k =>
      s"""kth$k AS (
           SELECT event_type, hv FROM (
             SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
             FROM h)
           WHERE rn = $k)""").mkString(",\n       ")
    val cols = KmvKs.map(k =>
      s"""CAST(COALESCE((${k - 1} * 4294967296) // kth$k.hv, cnt.nh)
           AS BIGINT) AS est_k$k""").mkString(",\n         ")
    val joins = KmvKs.map(k => s"LEFT JOIN kth$k USING (event_type)")
      .mkString("\n       ")
    s"""WITH h AS (
         SELECT DISTINCT event_type,
           list_reduce(list_transform(range(1, 9), i ->
             strpos('0123456789abcdef',
               substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1),
             (a, b) -> a * 16 + b) AS hv
         FROM events),
       $kth,
       cnt AS (SELECT event_type, count(*) AS nh FROM h GROUP BY 1),
       ex AS (
         SELECT event_type, count(DISTINCT user_id) AS n_exact
         FROM events GROUP BY 1)
       SELECT e.event_type,
         $cols,
         e.n_exact
       FROM ex e
       JOIN cnt USING (event_type)
       $joins
       ORDER BY event_type"""
  }

  /** q345 — FUNCTIONAL-DEPENDENCY PROFILE: for six candidate column
    * pairs over orders⋈customer, test A→B by the cardinality
    * identity |distinct A| = |distinct (A,B)| — the schema-discovery
    * primitive behind key detection and normalization advice. All
    * twelve distinct-counts fold in ONE aggregate (Spark's expand);
    * an inline reshape emits one row per tested dependency with the
    * verdict.
    *
    * Scale: one joined scan; the expand multiplies rows by the
    * distinct-spec count before partial aggregation — the documented
    * cost of single-pass profiling (run it on a sample first at
    * 100 TB). */
  def q345FdProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val f = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority",
        $"o_orderstatus", $"c_mktsegment", $"c_nationkey")
    val pairs = Seq(
      ("o_custkey", "c_mktsegment"),
      ("o_custkey", "c_nationkey"),
      ("c_mktsegment", "c_nationkey"),
      ("o_orderpriority", "o_orderstatus"),
      ("o_orderkey", "o_custkey"),
      ("o_orderpriority", "c_mktsegment"))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(countDistinct(col(a)).as(s"na_$i"),
        countDistinct(col(a), col(b)).as(s"nab_$i"))
    }
    val structs = pairs.zipWithIndex.map { case ((a, b), i) =>
      s"struct('$a' AS determinant, '$b' AS dependent, " +
        s"na_$i AS n_det, nab_$i AS n_pair)"
    }.mkString(", ")
    f.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"inline(array($structs))"))
      .withColumn("holds", $"n_det" === $"n_pair")
      .orderBy($"determinant", $"dependent")
  }

  def q345Sql: String = {
    val pairs = Seq(
      ("o_custkey", "c_mktsegment"),
      ("o_custkey", "c_nationkey"),
      ("c_mktsegment", "c_nationkey"),
      ("o_orderpriority", "o_orderstatus"),
      ("o_orderkey", "o_custkey"),
      ("o_orderpriority", "c_mktsegment"))
    val arms = pairs.map { case (a, b) =>
      s"""SELECT '$a' AS determinant, '$b' AS dependent,
            CAST(count(DISTINCT $a) AS BIGINT) AS n_det,
            CAST(count(DISTINCT ($a, $b)) AS BIGINT) AS n_pair
          FROM f"""
    }.mkString(" UNION ALL ")
    s"""WITH f AS (
         SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus,
           c_mktsegment, c_nationkey
         FROM orders JOIN customer ON o_custkey = c_custkey),
       arms AS ($arms)
       SELECT determinant, dependent, n_det, n_pair,
         n_det = n_pair AS holds
       FROM arms ORDER BY determinant, dependent"""
  }
}
