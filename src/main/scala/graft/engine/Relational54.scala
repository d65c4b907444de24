package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventy-third query wave: q352 autocorrelation of the daily order
  * series (the classic seasonality detector on an exact integer
  * moment grid), q353 FIFO container packing audit (interval
  * allocation over grouped prefix sums — the fulfilment/cost-basis
  * matching shape), and q354 candidate-key discovery (uniqueness
  * profiling — completing the q345 FD / q350 IND data-profiling trio).
  */
object Relational54 {

  /** q352 — AUTOCORRELATION FUNCTION of the daily order-count series
    * at lags 1/7/14/28 (weekly and monthly seasonality screen). The
    * calendar grid is densified (zero-order days count as 0 — the
    * series is regular, not "observed days only"), then every term is
    * the scaled deviation z_d = N·y_d − S (an exact BIGINT: mean
    * centering without rationals), giving
    * acf(k) = Σ_{d≤N−k} z_d·z_{d+k} / Σ_d z_d² — two exact integer
    * moments and ONE final IEEE division, bit-identical across engines.
    *
    * Scale: everything is calendar-bounded, not row-bounded — the
    * grid is |days| rows regardless of SF; daily counts fold map-side
    * before ever touching the grid. The lag join keys on the day
    * index (broadcast by AQE at grid size). Overflow bound:
    * |z| ≤ N·max_daily, so Σz² ≤ N³·max², ≈ 10^16 even at
    * thousands-of-orders-per-day scale — audited, inside BIGINT. */
  def q352Acf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.orders(spark, sfDir)
      .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"))
    val bounds = days.agg(min($"d").as("mn"), max($"d").as("mx"))
    val grid = bounds
      .select(explode(expr("sequence(mn, mx)")).as("d"))
    val counts = days.groupBy($"d").agg(count(lit(1)).as("y"))
    val series = grid.join(counts, Seq("d"), "left_outer")
      .na.fill(0L, Seq("y"))
    val tot = series.agg(count(lit(1)).as("n"), sum($"y").as("s"))
    val z = series.crossJoin(broadcast(tot))
      .select($"d", ($"n" * $"y" - $"s").as("z"))
    val den = z.agg(sum($"z" * $"z").as("den"))
    val lags = Seq(1L, 7L, 14L, 28L).toDF("lag")
    z.as("x").crossJoin(broadcast(lags).as("l"))
      .join(z.as("w"), $"w.d" === $"x.d" + $"l.lag")
      .groupBy($"l.lag".as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum($"x.z" * $"w.z").as("num"))
      .crossJoin(broadcast(den))
      .select($"lag", $"n_pairs", $"num", $"den",
        ($"num".cast("double") / $"den".cast("double")).as("acf"))
      .orderBy($"lag")
  }

  def q352Sql: String =
    """WITH days AS (
         SELECT CAST(date_diff('day', DATE '1995-01-01',
           CAST(o_orderdate AS DATE)) AS BIGINT) AS d
         FROM orders),
       bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM days),
       grid AS (SELECT unnest(generate_series(mn, mx)) AS d FROM bounds),
       counts AS (SELECT d, CAST(count(*) AS BIGINT) AS y
                  FROM days GROUP BY d),
       series AS (
         SELECT g.d, coalesce(c.y, 0) AS y
         FROM grid g LEFT JOIN counts c ON g.d = c.d),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(y) AS BIGINT) AS s FROM series),
       z AS (SELECT d, t.n * y - t.s AS z FROM series CROSS JOIN tot t),
       den AS (SELECT CAST(sum(z * z) AS BIGINT) AS den FROM z),
       lags AS (SELECT * FROM (VALUES (1), (7), (14), (28)) AS l(lag))
       SELECT CAST(l.lag AS BIGINT) AS lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(x.z * w.z) AS BIGINT) AS num,
         d.den AS den,
         CAST(sum(x.z * w.z) AS DOUBLE) / CAST(d.den AS DOUBLE) AS acf
       FROM lags l
       JOIN z x ON true
       JOIN z w ON w.d = x.d + l.lag
       CROSS JOIN den d
       GROUP BY l.lag, d.den
       ORDER BY lag"""

  /** Fixed container capacity for [[q353FifoContainers]], in
    * centi-units (5000 = 50 quantity units). */
  val Q353Capacity = 5000L

  /** q353 — FIFO CONTAINER PACKING AUDIT: each supplier ships line
    * items in (shipdate, orderkey, linenumber) order into fixed-
    * capacity containers filled first-in-first-out; a line whose
    * quantity interval [end−q, end) straddles a capacity boundary must
    * be split across containers (the same math as FIFO inventory/cost-
    * basis matching: lot index = prefix div capacity). Quantities ride
    * the exact cents grid, so intervals are integers and every lot
    * index is a non-negative integer division — floor and truncate
    * agree, no cross-engine drift. Per supplier: line/unit totals,
    * containers used, boundary-straddling lines, and the widest span.
    *
    * Scale: the inclusive prefix sums come from
    * [[DistRank.withGroupedRunningSums]] — per-(supplier, bucket)
    * local sorts lifted by a tiny triangular broadcast join, never a
    * per-supplier single-partition window; the rest is one grouped
    * fold. Adding a supplier adds a group, not a stage.
    *
    * Ordering determinism: this fixture's (l_orderkey, l_linenumber)
    * is NOT unique (q354 proves it — linenumber repeats within an
    * order), so the FIFO tie-break is a 60-bit md5 key over
    * (orderkey, linenumber, partkey, quantity). Rows that still tie
    * carry identical quantities, and equal-quantity swaps leave every
    * prefix interval — hence every lot index — unchanged, so the
    * result is order-deterministic without any engine-side total
    * order (tie uniqueness per supplier is also data-checked at all
    * three SFs). */
  def q353FifoContainers(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_suppkey".as("s"),
        datediff(to_date($"l_shipdate"), lit("1995-01-01"))
          .cast("long").as("kd"),
        $"l_orderkey", $"l_linenumber", $"l_partkey",
        Exact.cents($"l_quantity").as("q"))
      .withColumn("tie", expr(
        """CAST(conv(substr(md5(concat_ws('|', l_orderkey, l_linenumber,
          |  l_partkey, q)), 1, 15), 16, 10) AS BIGINT)""".stripMargin))
      .select($"s", $"kd", $"tie", $"q")
    val run = DistRank.withGroupedRunningSums(
      li, Seq("s"), "kd", "tie", Seq("q" -> "endq"))
    val cap = Q353Capacity
    run
      .select($"s", $"q", $"endq",
        expr(s"(endq - q) div $cap").as("lot0"),
        expr(s"(endq - 1) div $cap").as("lot1"))
      .groupBy($"s")
      .agg(count(lit(1)).as("n_lines"),
        sum($"q").as("total_centi"),
        (max($"lot1") + 1L).as("n_containers"),
        sum(when($"lot0" =!= $"lot1", 1L).otherwise(0L)).as("n_split"),
        max($"lot1" - $"lot0" + 1L).as("max_span"))
      .select($"s".as("s_suppkey"), $"n_lines", $"total_centi",
        $"n_containers", $"n_split", $"max_span")
      .orderBy($"s_suppkey")
  }

  def q353Sql: String =
    s"""WITH li AS (
         SELECT l_suppkey AS s,
           CAST(date_diff('day', DATE '1995-01-01',
             CAST(l_shipdate AS DATE)) AS BIGINT) AS kd,
           CAST('0x' || substr(md5(concat_ws('|', l_orderkey,
             l_linenumber, l_partkey,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))),
             1, 15) AS BIGINT) AS tie,
           CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q
         FROM lineitem),
       run AS (
         SELECT s, q,
           sum(q) OVER (PARTITION BY s ORDER BY kd, tie
             ROWS UNBOUNDED PRECEDING) AS endq
         FROM li),
       lots AS (
         SELECT s, q, endq,
           (endq - q) // ${Q353Capacity} AS lot0,
           (endq - 1) // ${Q353Capacity} AS lot1
         FROM run)
       SELECT s AS s_suppkey, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(q) AS BIGINT) AS total_centi,
         CAST(max(lot1) + 1 AS BIGINT) AS n_containers,
         CAST(sum(CASE WHEN lot0 <> lot1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_split,
         CAST(max(lot1 - lot0 + 1) AS BIGINT) AS max_span
       FROM lots GROUP BY s ORDER BY s_suppkey"""

  /** q354 — CANDIDATE-KEY DISCOVERY: uniqueness profiling of a
    * registry of single- and multi-column key candidates across all
    * tables — the third leg of the data-profiling stack (q345
    * functional dependencies, q350 inclusion dependencies, and now
    * primary keys). The registry deliberately mixes true keys
    * (o_orderkey, the (l_orderkey, l_linenumber) compound,
    * c_custkey, c_name), near-keys that fail on a handful of
    * collisions ((o_custkey, o_orderdate)), and clear rejections
    * (l_orderkey, p_name) so the verdict column demonstrates all
    * three outcomes.
    *
    * Scale: each candidate costs one projected scan folded by a
    * hash groupBy on the candidate columns (partial aggregation
    * map-side — the two-level count-distinct that never collects a
    * value list), and candidates are independent — the union is
    * embarrassingly parallel. */
  def q354PkDiscovery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def prof(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
      df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("cnt"))
        .agg(sum($"cnt").as("n_rows"), count(lit(1)).as("n_distinct"))
        .select(lit(name).as("candidate"), $"n_rows", $"n_distinct")
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val e = Tables.events(spark, sfDir)
    val d = Tables.documents(spark, sfDir)
    val m = Tables.embeddings(spark, sfDir)
    val cands = Seq(
      prof(o, "orders(o_orderkey)", Seq("o_orderkey")),
      prof(o, "orders(o_custkey,o_orderdate)",
        Seq("o_custkey", "o_orderdate")),
      prof(l, "lineitem(l_orderkey)", Seq("l_orderkey")),
      prof(l, "lineitem(l_orderkey,l_linenumber)",
        Seq("l_orderkey", "l_linenumber")),
      prof(c, "customer(c_custkey)", Seq("c_custkey")),
      prof(c, "customer(c_name)", Seq("c_name")),
      prof(p, "part(p_partkey)", Seq("p_partkey")),
      prof(p, "part(p_name)", Seq("p_name")),
      prof(e, "events(event_id)", Seq("event_id")),
      prof(e, "events(user_id,ts)", Seq("user_id", "ts")),
      prof(d, "documents(doc_id)", Seq("doc_id")),
      prof(m, "embeddings(vec_id)", Seq("vec_id")))
    cands.reduce(_.unionAll(_))
      .select($"candidate", $"n_rows", $"n_distinct",
        ($"n_rows" - $"n_distinct").as("dup_rows"),
        expr("(1000 * n_distinct) div n_rows").as("uniq_permille"),
        when($"n_rows" === $"n_distinct", 1L).otherwise(0L).as("is_key"))
      .orderBy($"candidate")
  }

  def q354Sql: String = {
    val cands = Seq(
      ("orders(o_orderkey)", "orders", "o_orderkey"),
      ("orders(o_custkey,o_orderdate)", "orders", "o_custkey, o_orderdate"),
      ("lineitem(l_orderkey)", "lineitem", "l_orderkey"),
      ("lineitem(l_orderkey,l_linenumber)", "lineitem",
        "l_orderkey, l_linenumber"),
      ("customer(c_custkey)", "customer", "c_custkey"),
      ("customer(c_name)", "customer", "c_name"),
      ("part(p_partkey)", "part", "p_partkey"),
      ("part(p_name)", "part", "p_name"),
      ("events(event_id)", "events", "event_id"),
      ("events(user_id,ts)", "events", "user_id, ts"),
      ("documents(doc_id)", "documents", "doc_id"),
      ("embeddings(vec_id)", "embeddings", "vec_id"))
    val rows = cands.map { case (nm, t, cs) =>
      s"""SELECT '$nm' AS candidate,
            (SELECT CAST(count(*) AS BIGINT) FROM $t) AS n_rows,
            (SELECT CAST(count(*) AS BIGINT)
             FROM (SELECT DISTINCT $cs FROM $t)) AS n_distinct"""
    }.mkString("\n         UNION ALL ")
    s"""WITH raw AS (
         $rows)
       SELECT candidate, n_rows, n_distinct,
         n_rows - n_distinct AS dup_rows,
         (1000 * n_distinct) // n_rows AS uniq_permille,
         CAST(CASE WHEN n_rows = n_distinct THEN 1 ELSE 0 END AS BIGINT)
           AS is_key
       FROM raw ORDER BY candidate"""
  }
}
