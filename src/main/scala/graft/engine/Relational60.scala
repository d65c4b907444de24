package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventy-ninth query wave: q369 t-closeness audit (L1 distance in
  * permille between each quasi-identifier group's sensitive-value
  * distribution and the global one — the distributional privacy test
  * that k-anonymity/l-diversity (q247) cannot see), q370
  * largest-triangle downsampling of the daily revenue series (the
  * one-bucket LTOB variant: per-bucket argmax of the second
  * difference on a uniform grid), and q371 max-min fair-share
  * allocation (water-filling over sorted demands with exact
  * remainder accounting).
  */
object Relational60 {

  /** q369 — T-CLOSENESS AUDIT: for each (nation, market-segment)
    * quasi-identifier group, the L1 distance between the group's
    * order-priority distribution and the corpus-wide one, on an
    * exact permille grid. A group can be k-anonymous and l-diverse
    * (q247) while its sensitive distribution still leaks — e.g. 90%
    * URGENT where the corpus is 20% — and this is the statistic that
    * catches it. Permille shares use floor division on non-negative
    * operands, where Spark `div` and DuckDB `//` agree.
    *
    * Scale: one orders→customer equi join (customer is the small
    * side at fixture scale but orders-partitioned at 100 TB — left
    * to AQE), a group×priority aggregate whose frame is bounded by
    * |QI domain|·|priorities|, and a broadcast of the 5-row global
    * distribution. */
  def q369TCloseness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment".as("seg"))
    val nat = Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name")
    val o = Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderpriority".as("pri"))
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"seg", $"pri")
    val grp = o.groupBy($"n_name", $"seg", $"pri")
      .agg(count(lit(1)).as("cnt"))
    val grpTot = grp.groupBy($"n_name", $"seg")
      .agg(sum($"cnt").as("ng"))
    val glob = o.groupBy($"pri").agg(count(lit(1)).as("gcnt"))
    val globTot = o.agg(count(lit(1)).as("n"))
    // every (group, priority) cell, including zero cells — the L1
    // sum must see priorities the group never emitted.
    val cells = grpTot.crossJoin(broadcast(glob))
      .join(grp, Seq("n_name", "seg", "pri"), "left_outer")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(globTot))
    cells.select($"n_name", $"seg", $"ng",
        abs(expr("(1000 * cnt) div ng") -
          expr("(1000 * gcnt) div n")).as("dist"))
      .groupBy($"n_name", $"seg")
      .agg(max($"ng").as("n_orders"), sum($"dist").as("t_permille"))
      .orderBy($"n_name", $"seg")
  }

  def q369Sql: String =
    """WITH o AS (
         SELECT n_name, c_mktsegment AS seg,
           o_orderpriority AS pri
         FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey),
       grp AS (SELECT n_name, seg, pri,
                 CAST(count(*) AS BIGINT) AS cnt
               FROM o GROUP BY 1, 2, 3),
       grp_tot AS (SELECT n_name, seg, CAST(sum(cnt) AS BIGINT) AS ng
                   FROM grp GROUP BY 1, 2),
       gdist AS (SELECT pri, CAST(count(*) AS BIGINT) AS gcnt
                FROM o GROUP BY 1),
       gtot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
       cells AS (
         SELECT t.n_name, t.seg, t.ng, g.pri, g.gcnt,
           coalesce(x.cnt, 0) AS cnt
         FROM grp_tot t CROSS JOIN gdist g
         LEFT JOIN grp x
           ON x.n_name = t.n_name AND x.seg = t.seg AND x.pri = g.pri)
       SELECT n_name, seg, max(ng) AS n_orders,
         CAST(sum(abs((1000 * cnt) // ng - (1000 * gcnt) // n))
           AS BIGINT) AS t_permille
       FROM cells, gtot
       GROUP BY n_name, seg ORDER BY n_name, seg"""

  /** q370 bucket count target (actual width derives from the span). */
  val Q370Buckets = 24L

  /** q370 — LARGEST-TRIANGLE DOWNSAMPLING (one-bucket LTOB variant)
    * of the gap-filled daily revenue series: split the calendar into
    * [[Q370Buckets]] equal-width buckets and keep, per bucket, the
    * day with the largest triangle area against its immediate
    * neighbors — on a uniform grid that area reduces to the absolute
    * SECOND DIFFERENCE |y_{d−1} − 2·y_d + y_{d+1}|, an exact integer.
    * This is the standard visual-fidelity downsampler for plotting a
    * 100 TB-derived series at screen resolution without smearing the
    * spikes a mean-per-bucket resample would erase.
    *
    * Scale: the daily fold is map-side; neighbor access is two
    * self-equi-joins on the dense calendar grid (no window at all);
    * the argmax is a per-bucket aggregate with a join-back tie-break
    * (smallest qualifying day), deterministic in both engines. */
  def q370LtobDownsample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.orders(spark, sfDir).select(
      datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"),
      Exact.cents($"o_totalprice").as("c"))
    val bounds = days.agg(min($"d").as("mn"), max($"d").as("mx"))
    val grid = bounds.select($"mn", $"mx",
      explode(expr("sequence(mn, mx)")).as("d"))
    val daily = days.groupBy($"d").agg(sum($"c").as("y"))
    val series = grid.join(daily, Seq("d"), "left_outer")
      .na.fill(0L, Seq("y"))
      .select($"d", $"y", $"mn",
        expr(s"((mx - mn + 1) div $Q370Buckets) + 1").as("w"))
    val mid = series.filter($"d" > $"mn")
    val scored = mid.as("m")
      .join(series.as("l"), col("l.d") === col("m.d") - 1)
      .join(series.as("r"), col("r.d") === col("m.d") + 1)
      .select(col("m.d").as("d"), col("m.y").as("y"),
        expr("(m.d - m.mn) div m.w").as("bucket"),
        abs(col("l.y") - lit(2L) * col("m.y") + col("r.y")).as("score"))
    val best = scored.groupBy($"bucket").agg(max($"score").as("ms"))
    scored.join(best, Seq("bucket"))
      .filter($"score" === $"ms")
      .groupBy($"bucket")
      .agg(min($"d").as("sel_day"), max($"ms").as("score"))
      .join(scored.select($"d".as("sel_day"), $"y".as("sel_cents"))
        .distinct(), Seq("sel_day"))
      .select($"bucket", $"sel_day", $"sel_cents", $"score")
      .orderBy($"bucket")
  }

  def q370Sql: String =
    s"""WITH days AS (
         SELECT CAST(date_diff('day', DATE '1995-01-01',
             CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS c
         FROM orders),
       bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM days),
       grid AS (SELECT mn, mx, unnest(generate_series(mn, mx)) AS d
                FROM bounds),
       daily AS (SELECT d, CAST(sum(c) AS BIGINT) AS y
                 FROM days GROUP BY d),
       series AS (
         SELECT g.d, coalesce(y, 0) AS y, g.mn,
           ((g.mx - g.mn + 1) // $Q370Buckets) + 1 AS w
         FROM grid g LEFT JOIN daily USING (d)),
       scored AS (
         SELECT m.d, m.y, (m.d - m.mn) // m.w AS bucket,
           abs(l.y - 2 * m.y + r.y) AS score
         FROM series m
           JOIN series l ON l.d = m.d - 1
           JOIN series r ON r.d = m.d + 1
         WHERE m.d > m.mn),
       best AS (SELECT bucket, max(score) AS ms
                FROM scored GROUP BY bucket),
       sel AS (
         SELECT s.bucket, min(s.d) AS sel_day, max(s.score) AS score
         FROM scored s JOIN best b
           ON s.bucket = b.bucket AND s.score = b.ms
         GROUP BY s.bucket)
       SELECT sel.bucket, sel.sel_day,
         (SELECT DISTINCT y FROM scored
          WHERE scored.d = sel.sel_day) AS sel_cents,
         sel.score
       FROM sel ORDER BY bucket"""

  /** q371 — MAX-MIN FAIR-SHARE ALLOCATION (water-filling): nations
    * demand their total order value in cents; capacity is half the
    * grand total; the max-min fair allocation fully satisfies every
    * demand below the water level L and caps the rest at L, with the
    * integer remainder distributed one cent each to the first
    * capped tenants in sorted order so Σ alloc == capacity EXACTLY.
    * This is the allocator shape every multi-tenant quota system
    * (shuffle slots, ingest bandwidth, GPU-hours) runs.
    *
    * Scale: demands fold to one row per tenant; the sort + prefix
    * sums are ONE [[DistRank.withRunningSums]] pass over the tenant
    * frame; the water level is a 1-row broadcast derived from the
    * prefix frame — no driver loop, no global window. */
  def q371FairShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey")
    val nat = Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name")
    // demands is a |nations|-row frame derived from an orders-scale
    // join — checkpoint it (and between the two chained DistRank
    // passes, the q170 discipline) so the prefix/rank machinery and
    // the totals aggregate don't re-run the join per consumer
    val demands = Tables.orders(spark, sfDir)
      .select($"o_custkey", Exact.cents($"o_totalprice").as("c"))
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name").agg(sum($"c").as("demand"))
      .localCheckpoint()
    val ranked = DistRank.withRank(
      DistRank.withRunningSums(demands, "demand", "n_name",
        Seq("demand" -> "prefix")).localCheckpoint(),
      "demand", "n_name", "rk", desc = false)
    val totals = demands.agg(sum($"demand").as("tot"),
      count(lit(1)).as("nt"))
    val withCap = ranked.crossJoin(broadcast(totals))
      .select($"n_name", $"demand", $"prefix", $"rk", $"nt",
        expr("tot div 2").as("cap"))
    // fully-satisfied prefix: demand * remaining-count fits in what
    // is left after the earlier (smaller) demands are paid in full.
    val flagged = withCap.select($"n_name", $"demand", $"prefix",
      $"rk", $"nt", $"cap",
      ($"demand" * ($"nt" - $"rk" + 1L) + $"prefix" - $"demand" <=
        $"cap").cast("long").as("full"))
    val lvl = flagged.agg(
        sum($"full").as("kstar"),
        coalesce(max(when($"full" === 1L, $"prefix")), lit(0L))
          .as("sk"),
        max($"cap").as("cap2"), max($"nt").as("nt2"))
      .select($"kstar", $"sk",
        expr("(cap2 - sk) div (nt2 - kstar)").as("lvl"),
        expr("(cap2 - sk) % (nt2 - kstar)").as("rem"))
    flagged.crossJoin(broadcast(lvl))
      .select($"n_name", $"demand",
        when($"full" === 1L, $"demand")
          .otherwise($"lvl" +
            when($"rk" - $"kstar" <= $"rem", 1L).otherwise(0L))
          .as("alloc"),
        $"full".as("fully_satisfied"))
      .orderBy($"n_name")
  }

  def q371Sql: String =
    """WITH demands AS (
         SELECT n_name,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS demand
         FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name),
       ranked AS (
         SELECT n_name, demand,
           sum(demand) OVER (ORDER BY demand, n_name
             ROWS UNBOUNDED PRECEDING) AS prefix,
           row_number() OVER (ORDER BY demand, n_name) AS rk,
           (SELECT count(*) FROM demands) AS nt,
           (SELECT sum(demand) FROM demands) // 2 AS cap
         FROM demands),
       flagged AS (
         SELECT *, CASE WHEN demand * (nt - rk + 1) + prefix - demand
             <= cap THEN 1 ELSE 0 END AS full_flag
         FROM ranked),
       lvl AS (
         SELECT CAST(sum(full_flag) AS BIGINT) AS kstar,
           coalesce(max(CASE WHEN full_flag = 1 THEN prefix END), 0)
             AS sk,
           max(cap) AS cap2, max(nt) AS nt2
         FROM flagged),
       lvl2 AS (
         SELECT kstar, sk, (cap2 - sk) // (nt2 - kstar) AS lvl,
           (cap2 - sk) % (nt2 - kstar) AS rem
         FROM lvl)
       SELECT n_name, demand,
         CAST(CASE WHEN full_flag = 1 THEN demand
           ELSE lvl + (CASE WHEN rk - kstar <= rem THEN 1 ELSE 0 END)
           END AS BIGINT) AS alloc,
         CAST(full_flag AS BIGINT) AS fully_satisfied
       FROM flagged, lvl2 ORDER BY n_name"""
}
