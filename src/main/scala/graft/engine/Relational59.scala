package graft.engine

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventy-eighth query wave: q366 Kaplan–Meier risk table for
  * customer repeat purchase (right-censored survival, factored as
  * exact integer risk sets), q367 peak-to-trough max drawdown per
  * event-type daily revenue series (running-max window statistics),
  * and q368 iterated k-core peeling of the part co-order graph
  * (degree-threshold contraction to fixpoint, unrolled).
  */
object Relational59 {

  /** q366 — KAPLAN–MEIER RISK TABLE: time from a customer's FIRST
    * order to their SECOND (the repeat-purchase "survival" event),
    * right-censored at the fixture's last order date for one-order
    * customers. Emitted FACTORED — per distinct time t: events d_t,
    * censorings c_t, and the at-risk count n_t = N − Σ_{s<t}(d_s+c_s)
    * (the standard convention: subjects censored at t are still at
    * risk for events at t). The S(t) product is a downstream float
    * fold over this exact table; the table itself — what a
    * significance test (log-rank) actually consumes — stays integer.
    *
    * Scale: two grouped passes over orders (per-customer min date,
    * then the conditional second-min), one groupBy over times (frame
    * bounded by the calendar span, not the row count), and ONE
    * [[DistRank.withRunningSums]] lift for the cumulative risk-set
    * subtraction — no unpartitioned window anywhere. */
  def q366KaplanMeier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir).select(
      $"o_custkey".as("ck"),
      datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"))
    val horizon = o.agg(max($"d").as("maxd"))
    val firsts = o.groupBy($"ck").agg(
      count(lit(1)).as("n"), min($"d").as("fd"))
    // second order date: the first date again if two orders tie on
    // the minimum, else the smallest strictly-later date.
    val second = o.join(firsts, Seq("ck"))
      .groupBy($"ck", $"n", $"fd")
      .agg(sum(when($"d" === $"fd", 1L).otherwise(0L)).as("at_min"),
        min(when($"d" > $"fd", $"d")).as("later"))
      .select($"ck", $"n", $"fd",
        when($"at_min" >= 2L, $"fd").otherwise($"later").as("sd"))
    val subjects = second.crossJoin(broadcast(horizon)).select(
      when($"n" >= 2L, $"sd" - $"fd").otherwise($"maxd" - $"fd")
        .as("t"),
      when($"n" >= 2L, 1L).otherwise(0L).as("ev"))
    val byTime = subjects.groupBy($"t").agg(
      sum($"ev").as("events"),
      sum(lit(1L) - $"ev").as("censored"))
    val cum = DistRank.withRunningSums(byTime, "t", "t",
      Seq("events" -> "cume", "censored" -> "cumc"))
    val total = subjects.agg(count(lit(1)).as("n_subjects"))
    cum.crossJoin(broadcast(total))
      .select($"t", $"events", $"censored",
        ($"n_subjects" - ($"cume" - $"events") - ($"cumc" - $"censored"))
          .as("at_risk"))
      .orderBy($"t")
  }

  def q366Sql: String =
    """WITH o AS (
         SELECT o_custkey AS ck,
           CAST(date_diff('day', DATE '1995-01-01',
             CAST(o_orderdate AS DATE)) AS BIGINT) AS d
         FROM orders),
       horizon AS (SELECT max(d) AS maxd FROM o),
       firsts AS (SELECT ck, CAST(count(*) AS BIGINT) AS n,
                    min(d) AS fd FROM o GROUP BY ck),
       second AS (
         SELECT o.ck, f.n, f.fd,
           CASE WHEN sum(CASE WHEN o.d = f.fd THEN 1 ELSE 0 END) >= 2
                THEN f.fd
                ELSE min(CASE WHEN o.d > f.fd THEN o.d END) END AS sd
         FROM o JOIN firsts f ON o.ck = f.ck
         GROUP BY o.ck, f.n, f.fd),
       subjects AS (
         SELECT CASE WHEN n >= 2 THEN sd - fd ELSE maxd - fd END AS t,
           CASE WHEN n >= 2 THEN 1 ELSE 0 END AS ev
         FROM second, horizon),
       by_time AS (
         SELECT t, CAST(sum(ev) AS BIGINT) AS events,
           CAST(sum(1 - ev) AS BIGINT) AS censored
         FROM subjects GROUP BY t),
       cum AS (
         SELECT t, events, censored,
           sum(events) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
             AS cume,
           sum(censored) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
             AS cumc
         FROM by_time),
       total AS (SELECT CAST(count(*) AS BIGINT) AS n_subjects
                 FROM subjects)
       SELECT t, events, censored,
         CAST(n_subjects - (cume - events) - (cumc - censored)
           AS BIGINT) AS at_risk
       FROM cum, total ORDER BY t"""

  /** q367 — MAX DRAWDOWN per event-type daily revenue series: for
    * each event_type, the daily sum of value (exact cents) ordered by
    * day; drawdown at day d is runmax_{s≤d}(v) − v_d, and the
    * headline is the worst such decline — the risk statistic every
    * revenue/throughput monitor wants alongside q163's EWMA and
    * q179's CUSUM. Emits per type: days observed, the series peak,
    * trough, final value, and the max drawdown, all exact cents.
    *
    * Scale: the running max is a window PARTITIONED by event_type
    * over the daily frame — partition width is the CALENDAR span
    * (rows fold to one per type×day map-side first), never the event
    * count, so the window input is bounded at any corpus scale. */
  def q367MaxDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, sfDir)
      .select($"event_type".as("etype"),
        datediff(to_date($"ts"), lit("1995-01-01")).cast("long").as("d"),
        Exact.cents($"value").as("c"))
      .groupBy($"etype", $"d").agg(sum($"c").as("v"))
    val w = Window.partitionBy($"etype").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select($"etype", $"d", $"v", max($"v").over(w).as("rm"))
      .groupBy($"etype")
      .agg(count(lit(1)).as("n_days"),
        max($"v").as("peak_cents"),
        min($"v").as("trough_cents"),
        max($"rm" - $"v").as("max_drawdown_cents"),
        max_by($"v", $"d").as("final_cents"))
      .select($"etype".as("event_type"), $"n_days", $"peak_cents",
        $"trough_cents", $"max_drawdown_cents", $"final_cents")
      .orderBy($"event_type")
  }

  def q367Sql: String =
    """WITH daily AS (
         SELECT event_type AS etype,
           CAST(date_diff('day', DATE '1995-01-01',
             CAST(ts AS DATE)) AS BIGINT) AS d,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS v
         FROM events GROUP BY 1, 2),
       rm AS (
         SELECT etype, d, v,
           max(v) OVER (PARTITION BY etype ORDER BY d
             ROWS UNBOUNDED PRECEDING) AS rm
         FROM daily)
       SELECT etype AS event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         max(v) AS peak_cents,
         min(v) AS trough_cents,
         max(rm - v) AS max_drawdown_cents,
         max_by(v, d) AS final_cents
       FROM rm GROUP BY etype ORDER BY event_type"""

  /** q368 unroll depth. Empirically the peel reaches fixpoint in ≤4
    * rounds at sf0.001/sf0.01/sf0.1 (probed offline); 6 leaves slack
    * and the wave spec asserts the last round removed zero nodes, so
    * a fixture drift that needed more rounds fails loudly instead of
    * shipping a non-core. */
  val Q368Rounds = 6
  /** Degree threshold k for the core. */
  val Q368K = 6L

  /** q368 — k-CORE PEELING of the part co-order graph: nodes are
    * parts, edges join parts co-ordered in ≥2 distinct orders (the
    * same graph family as q360's min-plus walk, thresholded to kill
    * incidental pairs), and each round deletes every node whose
    * degree in the surviving induced subgraph is < k. The k-core —
    * the maximal subgraph of minimum degree ≥ k — is what survives;
    * the emitted trajectory (alive/removed per round) is the peel
    * audit a graph-curation pipeline logs. Unrolled to [[Q368Rounds]]
    * with fixpoint asserted in the spec (same bounded-iteration
    * contract as q360/q340).
    *
    * Scale: each round is one dst-keyed semi join of the PRE-dst-
    * PARTITIONED edge list against the alive set (no edge-scale
    * exchange — the checkpoint carries the partitioning), one degree
    * aggregate (the round's single edge-scale shuffle), and a src-
    * keyed alive filter that reuses the aggregate's partitioning; the
    * driver sees ONE scalar per round (q230/q302/q340 discipline) and
    * localCheckpoint cuts the loop lineage. Counting alive neighbors
    * BEFORE intersecting with the alive sources is equivalent: the
    * final semi join discards exactly the dead sources the old
    * src-first form excluded up front. The thresholded co-order pair
    * frame itself comes from the memoized
    * [[Relational56.coOrderCounts]] index (one build per session
    * serves q360/q368/q383/q386 instead of four identical
    * distinct-self-join pair builds). */
  def q368KcorePeel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = Relational56.coOrderCounts(spark, sfDir)
      .filter($"cnt" >= 2L)
    val und = pairs.select($"u".as("src"), $"v".as("dst"))
      .unionAll(pairs.select($"v".as("src"), $"u".as("dst")))
      .repartition($"dst")
      .localCheckpoint()
    var alive = und.select($"src".as("n")).distinct().localCheckpoint()
    var nAlive = alive.count()
    val traj = ArrayBuffer[(Long, Long, Long)]((0L, nAlive, 0L))
    for (r <- 1 to Q368Rounds) {
      val next = und
        .join(alive.select($"n".as("dn")), $"dst" === $"dn")
        .groupBy($"src").agg(count(lit(1)).as("deg"))
        .filter($"deg" >= Q368K)
        .join(alive.select($"n".as("sn")), $"src" === $"sn")
        .select($"src".as("n"))
        .localCheckpoint()
      val nNext = next.count()
      traj += ((r.toLong, nNext, nAlive - nNext))
      alive = next
      nAlive = nNext
    }
    traj.toSeq.toDF("round", "n_alive", "n_removed").orderBy($"round")
  }

  def q368Sql: String = {
    val k = Q368K
    val rounds = (1 to Q368Rounds).map { r =>
      s"""n$r AS MATERIALIZED (
           SELECT u AS n FROM und
           WHERE u IN (SELECT n FROM n${r - 1})
             AND v IN (SELECT n FROM n${r - 1})
           GROUP BY u HAVING count(*) >= $k)"""
    }.mkString(",\n")
    val rows = (0 to Q368Rounds).map { r =>
      val prev = if (r == 0) s"(SELECT count(*) FROM n0)"
        else s"(SELECT count(*) FROM n${r - 1})"
      s"""SELECT CAST($r AS BIGINT) AS round,
            CAST((SELECT count(*) FROM n$r) AS BIGINT) AS n_alive,
            CAST($prev - (SELECT count(*) FROM n$r) AS BIGINT)
              AS n_removed"""
    }.mkString("\nUNION ALL\n")
    // AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so
    // each round's three references to n{r-1} would re-evaluate the
    // whole chain — 3^rounds work that exploded past 230 GB of spill
    // on the x10 carve's densified graph; materialized, the peel is
    // linear in rounds (found in the r12 sf1 oracle pass)
    s"""WITH li AS MATERIALIZED (
         SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
         FROM lineitem),
       p AS MATERIALIZED (
         SELECT a.pk AS u, b.pk AS v
         FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         GROUP BY a.pk, b.pk HAVING count(*) >= 2),
       und AS MATERIALIZED (SELECT u, v FROM p UNION ALL SELECT v AS u, u AS v FROM p),
       n0 AS MATERIALIZED (SELECT DISTINCT u AS n FROM und),
       $rounds
       SELECT * FROM ($rows) ORDER BY round"""
  }
}
