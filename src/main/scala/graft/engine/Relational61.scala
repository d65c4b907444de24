package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eightieth query wave: q372 Allen interval-relation census over
  * per-customer order fulfillment intervals (the 13-relation temporal
  * algebra), q373 deterministic RANSAC consensus over the daily
  * revenue series (hash-seeded candidate lines, cross-multiplied
  * integer inlier test), and q374 TTL-cache hit-rate curve (the
  * re-access economics behind any dedup window or feature cache).
  */
object Relational61 {

  /** The q372 CASE ladder, shared verbatim by the Spark projection
    * and the DuckDB oracle: a FIRST-MATCH-WINS classification of
    * interval pair (as, ae) vs (bs, be) into Allen's 13 relations.
    * For proper intervals (start < end) the branches are mutually
    * exclusive and the ladder is exactly Allen's algebra; for
    * degenerate (point) intervals the ladder ORDER is the contract —
    * equality tests fire before the open-interval tests, so every
    * pair still lands in exactly one class. */
  def allenCase(as: String, ae: String, bs: String, be: String): String =
    s"""CASE
        WHEN $as = $bs AND $ae = $be THEN 'equals'
        WHEN $ae < $bs THEN 'precedes'
        WHEN $ae = $bs THEN 'meets'
        WHEN $as > $be THEN 'preceded_by'
        WHEN $as = $be THEN 'met_by'
        WHEN $as = $bs AND $ae < $be THEN 'starts'
        WHEN $as = $bs THEN 'started_by'
        WHEN $as < $bs AND $ae = $be THEN 'finished_by'
        WHEN $as > $bs AND $ae = $be THEN 'finishes'
        WHEN $as < $bs AND $ae > $be THEN 'contains'
        WHEN $as > $bs AND $ae < $be THEN 'during'
        WHEN $as < $bs THEN 'overlaps'
        ELSE 'overlapped_by' END"""

  /** q372 — ALLEN INTERVAL CENSUS: each order's fulfillment interval
    * runs from its order date to the latest ship date of its line
    * items; for every unordered pair of one customer's orders
    * (canonical by orderkey), the pair's temporal relation under
    * Allen's interval algebra is tallied corpus-wide. This census is
    * what a temporal-reasoning pipeline (overlap dedup, concurrency
    * audit, entailment features) computes before choosing join
    * predicates: 'precedes' dominating means as-of joins suffice,
    * heavy 'overlaps'/'during' mass means true interval joins.
    *
    * Scale: intervals fold from lineitem with one grouped max; the
    * pair generation is the q363 shape — a SELF-EQUI-JOIN on
    * o_custkey with an orderkey inequality, fan-out bounded by the
    * per-customer order count, never all-pairs global; the census is
    * a 13-row aggregate. */
  def q372AllenCensus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ends = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(max(to_date($"l_shipdate")).as("endd"))
    val iv = Tables.orders(spark, sfDir)
      .select($"o_orderkey".as("ok"), $"o_custkey".as("ck"),
        to_date($"o_orderdate").as("startd"))
      .join(ends, $"ok" === $"l_orderkey")
      .select($"ok", $"ck",
        datediff($"startd", lit("1995-01-01")).cast("long").as("s"),
        datediff($"endd", lit("1995-01-01")).cast("long").as("e"))
    iv.as("a").join(iv.as("b"),
        $"a.ck" === $"b.ck" && $"a.ok" < $"b.ok")
      .select(expr(allenCase("a.s", "a.e", "b.s", "b.e"))
        .as("relation"))
      .groupBy($"relation").agg(count(lit(1)).as("n_pairs"))
      .orderBy($"relation")
  }

  def q372Sql: String =
    s"""WITH ends AS (
         SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS endd
         FROM lineitem GROUP BY l_orderkey),
       iv AS (
         SELECT o_orderkey AS ok, o_custkey AS ck,
           CAST(date_diff('day', DATE '1995-01-01',
             CAST(o_orderdate AS DATE)) AS BIGINT) AS s,
           CAST(date_diff('day', DATE '1995-01-01', endd) AS BIGINT)
             AS e
         FROM orders JOIN ends ON o_orderkey = l_orderkey)
       SELECT ${allenCase("a.s", "a.e", "b.s", "b.e")} AS relation,
         CAST(count(*) AS BIGINT) AS n_pairs
       FROM iv a JOIN iv b ON a.ck = b.ck AND a.ok < b.ok
       GROUP BY 1 ORDER BY relation"""

  /** q373 candidate count (pairs drawn from the 2·K hash-smallest
    * days). */
  val Q373K = 16L

  /** q373 — DETERMINISTIC RANSAC CONSENSUS on the daily revenue
    * series: [[Q373K]] candidate lines, each through a pair of days
    * chosen by md5-hash rank (the derandomized sample — same trick as
    * the q320 k-means seeding), scored by how many observed days fall
    * within a tolerance band around the line. The inlier test is
    * CROSS-MULTIPLIED — |(y−y1)·Δd − (d−d1)·Δy| ≤ tol·Δd — so it
    * stays in exact integers; tolerance is a tenth of the mean daily
    * revenue. RANSAC's argmax-consensus is the robust alternative to
    * q121/q272's least squares and q358's Theil–Sen when the series
    * has structural breaks, not just heavy tails.
    *
    * Scale: candidates are a 2K-row hash-ranked head ([[DistRank]]
    * pass over the daily frame) broadcast against the series; the
    * score is one aggregate over a candidates×days frame bounded by
    * K·calendar — never data-scale. */
  def q373Ransac(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.orders(spark, sfDir)
      .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"),
        Exact.cents($"o_totalprice").as("c"))
      .groupBy($"d").agg(sum($"c").as("y"))
    val hashed = daily.select($"d", $"y",
      expr("CAST(conv(substr(md5(CAST(d AS STRING)), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
    val ranked = DistRank.withRank(hashed, "h", "d", "rk", desc = false)
      .filter($"rk" <= 2L * Q373K)
    val odd = ranked.filter($"rk" % 2L === 1L)
      .select(expr("(rk + 1) div 2").as("cand"),
        $"d".as("da"), $"y".as("ya"))
    val even = ranked.filter($"rk" % 2L === 0L)
      .select(expr("rk div 2").as("cand"), $"d".as("db"), $"y".as("yb"))
    val cands = odd.join(even, Seq("cand")).select($"cand",
      least($"da", $"db").as("d1"),
      when($"da" <= $"db", $"ya").otherwise($"yb").as("y1"),
      greatest($"da", $"db").as("d2"),
      when($"da" <= $"db", $"yb").otherwise($"ya").as("y2"))
    val tol = daily.agg(sum($"y").as("sy"), count(lit(1)).as("nd"))
      .select(expr("(sy div nd) div 10").as("tol"))
    val scored = daily.crossJoin(broadcast(cands))
      .crossJoin(broadcast(tol))
      .select($"cand", $"d1", $"d2", ($"y2" - $"y1").as("dy"),
        ($"d2" - $"d1").as("dx"),
        (abs(($"y" - $"y1") * ($"d2" - $"d1") -
          ($"d" - $"d1") * ($"y2" - $"y1")) <=
          $"tol" * ($"d2" - $"d1")).cast("long").as("inlier"))
      .groupBy($"cand", $"d1", $"d2", $"dy", $"dx")
      .agg(sum($"inlier").as("inliers"))
    val best = scored.agg(max($"inliers").as("mi"))
    scored.crossJoin(broadcast(best))
      .select($"cand", $"d1", $"d2", $"dy", $"dx", $"inliers",
        ($"inliers" === $"mi").cast("long").as("is_best"))
      .orderBy($"cand")
  }

  def q373Sql: String =
    s"""WITH daily AS (
         SELECT CAST(date_diff('day', DATE '1995-01-01',
             CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
             AS BIGINT)) AS BIGINT) AS y
         FROM orders GROUP BY 1),
       hashed AS (
         SELECT d, y,
           CAST('0x' || substr(md5(CAST(d AS VARCHAR)), 1, 15)
             AS BIGINT) AS h
         FROM daily),
       ranked AS (
         SELECT d, y, row_number() OVER (ORDER BY h, d) AS rk
         FROM hashed QUALIFY rk <= 2 * $Q373K),
       pairs AS (
         SELECT o.cand,
           least(o.da, e.db) AS d1,
           CASE WHEN o.da <= e.db THEN o.ya ELSE e.yb END AS y1,
           greatest(o.da, e.db) AS d2,
           CASE WHEN o.da <= e.db THEN e.yb ELSE o.ya END AS y2
         FROM (SELECT (rk + 1) // 2 AS cand, d AS da, y AS ya
               FROM ranked WHERE rk % 2 = 1) o
         JOIN (SELECT rk // 2 AS cand, d AS db, y AS yb
               FROM ranked WHERE rk % 2 = 0) e USING (cand)),
       tol AS (
         SELECT CAST((sum(y) // count(*)) // 10 AS BIGINT) AS tol
         FROM daily),
       scored AS (
         SELECT cand, d1, d2, y2 - y1 AS dy, d2 - d1 AS dx,
           CAST(sum(CASE WHEN abs((y - y1) * (d2 - d1) -
             (d - d1) * (y2 - y1)) <= tol * (d2 - d1)
             THEN 1 ELSE 0 END) AS BIGINT) AS inliers
         FROM daily CROSS JOIN pairs CROSS JOIN tol
         GROUP BY 1, 2, 3, 4, 5),
       best AS (SELECT max(inliers) AS mi FROM scored)
       SELECT cand, d1, d2, dy, dx, inliers,
         CAST(CASE WHEN inliers = mi THEN 1 ELSE 0 END AS BIGINT)
           AS is_best
       FROM scored, best ORDER BY cand"""

  /** q374 TTL grid (microseconds): 1 min, 1 h, 1 day, 7 days. */
  val Q374TtlsUs: Seq[Long] =
    Seq(60L, 3600L, 86400L, 604800L).map(_ * 1000000L)

  /** q374 — TTL-CACHE HIT-RATE CURVE: treat each (user, event_type)
    * as a cache key; an access HITS a TTL cache iff the same key was
    * seen within the TTL, MISSES COLD on its first appearance, and
    * MISSES EXPIRED otherwise. One lag pass computes every access's
    * re-use distance; the curve over the [[Q374TtlsUs]] grid is then
    * a fan-out aggregate. This inter-access economics decides dedup
    * window lengths and feature-cache TTLs before anyone provisions
    * the cache.
    *
    * Scale: the lag window is PARTITIONED by (user_id, event_type) —
    * millions of small partitions, the scale-safe window shape — and
    * the TTL fan-out multiplies the folded access frame by a 4-row
    * literal grid. */
  def q374TtlCache(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"us", $"event_id")
    val gaps = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("us"))
      .select($"event_type", ($"us" - lag($"us", 1).over(w)).as("gap"))
    val grid = Q374TtlsUs.toDF("ttl_us")
    gaps.crossJoin(broadcast(grid))
      .groupBy($"ttl_us", $"event_type")
      .agg(count(lit(1)).as("accesses"),
        sum(when($"gap".isNull, 1L).otherwise(0L)).as("cold"),
        sum(when($"gap" <= $"ttl_us", 1L).otherwise(0L)).as("hits"),
        sum(when($"gap" > $"ttl_us", 1L).otherwise(0L)).as("expired"))
      .orderBy($"ttl_us", $"event_type")
  }

  def q374Sql: String = {
    val grid = Q374TtlsUs.map(t => s"($t)").mkString(", ")
    s"""WITH gaps AS (
         SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY epoch_us(ts), event_id) AS gap
         FROM events),
       grid(ttl_us) AS (VALUES $grid)
       SELECT ttl_us, event_type,
         CAST(count(*) AS BIGINT) AS accesses,
         CAST(sum(CASE WHEN gap IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS cold,
         CAST(sum(CASE WHEN gap <= ttl_us THEN 1 ELSE 0 END)
           AS BIGINT) AS hits,
         CAST(sum(CASE WHEN gap > ttl_us THEN 1 ELSE 0 END) AS BIGINT)
           AS expired
       FROM gaps CROSS JOIN grid
       GROUP BY 1, 2 ORDER BY ttl_us, event_type"""
  }
}
