package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ninety-fourth query wave: q410 golden-record survivorship (the MDM
  * merge step after record linkage), q411 pinball-loss quantile
  * forecast evaluation, and q412 the checkpoint-interval trade-off
  * priced against the real failure timeline.
  */
object Relational74 {

  /** Fields the survivorship pass merges. */
  val Q410Fields: Seq[String] = Seq("name", "segment", "acctbal")

  /** q410 — GOLDEN-RECORD SURVIVORSHIP: after record linkage (q255)
    * clusters duplicate records, something must MERGE them. Each
    * customer appears as 3 replicas (r = 0 oldest .. 2 freshest);
    * a replica's field is STALE when md5(c_name, r, field) lands in
    * residue 0 mod 5 — data-dependent, deterministic, and never all
    * three replicas at once in expectation terms the census proves.
    * Survivorship: per field take the freshest non-stale replica.
    * Emits per field: stale-cell count, customers with any conflict,
    * and where the surviving value came from (r=2/1/0, or none when
    * every replica was stale) — the audit a master-data pipeline
    * publishes with every merge run.
    *
    * Scale: replicas fan out as an inline projection (one customer
    * scan ×3), the survivor pick is a grouped max over (customer,
    * field), the census a |fields|-row rollup. */
  def q410GoldenRecord(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val reps = Tables.customer(spark, sfDir)
      .select($"c_custkey".cast("long").as("ck"), $"c_name")
      .select($"ck", $"c_name",
        explode(array((0 to 2).map(r => lit(r.toLong)): _*)).as("r"))
    val cells = reps.select($"ck", $"r",
        explode(array(Q410Fields.map(f =>
          struct(lit(f).as("field"),
            expr(s"CAST(conv(substr(md5(concat(c_name, '#', CAST(r AS STRING), '#', '$f')), 1, 15), 16, 10) AS BIGINT) % 5 = 0")
              .as("stale"))): _*)).as("x"))
      .select($"ck", $"r", $"x.field".as("field"), $"x.stale".as("stale"))
    val picked = cells.groupBy($"ck", $"field")
      .agg(max(when(!$"stale", $"r").otherwise(lit(-1L))).as("chosen_r"),
        sum($"stale".cast("long")).as("n_stale"))
    picked.groupBy($"field")
      .agg(count(lit(1)).as("n_customers"),
        sum($"n_stale").as("stale_cells"),
        sum(($"n_stale" > 0L).cast("long")).as("conflicted"),
        sum(($"chosen_r" === 2L).cast("long")).as("from_r2"),
        sum(($"chosen_r" === 1L).cast("long")).as("from_r1"),
        sum(($"chosen_r" === 0L).cast("long")).as("from_r0"),
        sum(($"chosen_r" === -1L).cast("long")).as("unresolved"))
      .orderBy($"field")
  }

  def q410Sql: String = {
    val fieldSelects = Q410Fields.map { f =>
      s"""SELECT ck, r, '$f' AS field,
            CAST('0x' || substr(md5(c_name || '#' || CAST(r AS STRING)
              || '#' || '$f'), 1, 15) AS BIGINT) % 5 = 0 AS stale
          FROM reps"""
    }.mkString("\n          UNION ALL ")
    s"""WITH reps AS (
          SELECT CAST(c_custkey AS BIGINT) AS ck, c_name, r
          FROM customer, (VALUES (CAST(0 AS BIGINT)), (1), (2)) v(r)),
        cells AS (
          $fieldSelects),
        picked AS (
          SELECT ck, field,
            max(CASE WHEN NOT stale THEN r ELSE -1 END) AS chosen_r,
            CAST(sum(CASE WHEN stale THEN 1 ELSE 0 END) AS BIGINT)
              AS n_stale
          FROM cells GROUP BY ck, field)
        SELECT field, CAST(count(*) AS BIGINT) AS n_customers,
          CAST(sum(n_stale) AS BIGINT) AS stale_cells,
          CAST(sum(CASE WHEN n_stale > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS conflicted,
          CAST(sum(CASE WHEN chosen_r = 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS from_r2,
          CAST(sum(CASE WHEN chosen_r = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS from_r1,
          CAST(sum(CASE WHEN chosen_r = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS from_r0,
          CAST(sum(CASE WHEN chosen_r = -1 THEN 1 ELSE 0 END) AS BIGINT)
            AS unresolved
        FROM picked GROUP BY field ORDER BY field"""
  }

  /** Quantiles (permille) the pinball loss scores. */
  val Q411Quantiles: Seq[Long] = Seq(500L, 900L)

  /** q411 — PINBALL-LOSS FORECAST EVAL: the quantile twin of q399's
    * MASE. Over the gap-filled daily order series, two predictors of
    * day d — NAIVE (day d−1) and the ROLLING MEDIAN of days d−7..d−1
    * (exact: 4th smallest of 7) — are scored with the pinball loss
    * at the [[Q411Quantiles]] permille levels:
    * `L_q = q·(y−ŷ)⁺ + (1000−q)·(ŷ−y)⁺` (already ×1000, so every
    * loss is integral). The median predictor must win at q=500 on a
    * well-behaved series; at q=900 both under-forecast — exactly the
    * diagnosis this eval exists to surface.
    *
    * Scale: the rolling window is a 7-row grid equi-join (no
    * windows); losses are partial-aggregable sums; output is
    * |predictors|×|quantiles| rows. */
  def q411PinballEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.orders(spark, sfDir)
      .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
        .cast("long").as("d"))
    val bounds = days.agg(min($"d").as("mn"), max($"d").as("mx"))
    val grid = bounds.select(explode(expr("sequence(mn, mx)")).as("d"))
    val daily = days.groupBy($"d").agg(count(lit(1)).as("y"))
    val series = grid.join(daily, Seq("d"), "left_outer")
      .na.fill(0L, Seq("y")).localCheckpoint()
    val offs = series.as("t")
      .select($"t.d".as("d"), $"t.y".as("y"),
        explode(expr("sequence(1, 7)")).as("k"))
      .join(series.select($"d".as("dk"), $"y".as("yk")),
        $"dk" === $"d" - $"k")
    val preds = offs.groupBy($"d", $"y")
      .agg(count(lit(1)).as("nw"),
        max(when($"k" === 1, $"yk")).as("p_naive"),
        sort_array(collect_list($"yk")).as("ys"))
      .filter($"nw" === 7L) // ANSI: index only full windows
      .select($"d", $"y", $"p_naive",
        expr("element_at(ys, 4)").as("p_median"))
    val fanned = preds.select($"d", $"y",
        explode(array(
          struct(lit("naive").as("predictor"), $"p_naive".as("p")),
          struct(lit("rolling_median").as("predictor"),
            $"p_median".as("p")))).as("x"))
      .select($"d", $"y", $"x.predictor".as("predictor"), $"x.p".as("p"))
      .select($"d", $"y", $"predictor", $"p",
        explode(array(Q411Quantiles.map(q => lit(q)): _*)).as("q"))
    fanned.groupBy($"predictor", $"q")
      .agg(count(lit(1)).as("n_days"),
        sum(expr("CASE WHEN y >= p THEN q * (y - p)" +
          " ELSE (1000 - q) * (p - y) END")).as("loss_mass"))
      .withColumn("mean_loss_grid", expr("loss_mass div n_days"))
      .orderBy($"predictor", $"q")
  }

  def q411Sql: String = {
    val qList = Q411Quantiles.map(q => s"(CAST($q AS BIGINT))").mkString(", ")
    s"""WITH days AS (
          SELECT CAST(date_diff('day', DATE '1995-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS d
          FROM orders),
        bounds AS (SELECT min(d) AS mn, max(d) AS mx FROM days),
        grid AS (SELECT unnest(generate_series(mn, mx)) AS d FROM bounds),
        daily AS (SELECT d, CAST(count(*) AS BIGINT) AS y
                  FROM days GROUP BY d),
        series AS (SELECT g.d, coalesce(y, 0) AS y
                   FROM grid g LEFT JOIN daily USING (d)),
        offs AS (
          SELECT t.d, t.y, k.k, l.y AS yk
          FROM series t,
            (SELECT unnest(generate_series(1, 7)) AS k) k,
            series l
          WHERE l.d = t.d - k.k),
        preds AS (
          SELECT d, y, count(*) AS nw,
            max(CASE WHEN k = 1 THEN yk END) AS p_naive,
            list(yk ORDER BY yk)[4] AS p_median
          FROM offs GROUP BY d, y),
        fanned AS (
          SELECT d, y, predictor, p, q
          FROM (
            SELECT d, y, 'naive' AS predictor, p_naive AS p
            FROM preds WHERE nw = 7
            UNION ALL
            SELECT d, y, 'rolling_median', p_median FROM preds WHERE nw = 7),
            (VALUES $qList) qs(q))
        SELECT predictor, q, CAST(count(*) AS BIGINT) AS n_days,
          CAST(sum(CASE WHEN y >= p THEN q * (y - p)
            ELSE (1000 - q) * (p - y) END) AS BIGINT) AS loss_mass,
          CAST(sum(CASE WHEN y >= p THEN q * (y - p)
            ELSE (1000 - q) * (p - y) END) AS BIGINT)
            // CAST(count(*) AS BIGINT) AS mean_loss_grid
        FROM fanned GROUP BY predictor, q ORDER BY predictor, q"""
  }

  /** Checkpoint intervals priced (seconds) and the per-checkpoint
    * cost (seconds). */
  val Q412Intervals: Seq[Long] = Seq(900L, 3600L, 14400L)
  val Q412Cost = 30L

  /** q412 — CHECKPOINT-INTERVAL TRADE-OFF: the Young/Daly question
    * priced against the REAL failure timeline — every `error` event
    * is a failure; work lost at a failure is the time since the last
    * checkpoint grid point ((ts−t0) mod I); checkpoint overhead is
    * [[Q412Cost]] s × ⌊span/I⌋+1. Per interval: failures, checkpoint
    * count, overhead, lost work, and the total — the row with the
    * smallest total is the interval a streaming job should run at
    * (q412's answer to "how often should the q63 ingest
    * checkpoint"). All epoch-seconds integer arithmetic.
    *
    * Scale: one events scan; the interval grid is a 3-row inline
    * fan-out; everything aggregates partially. */
  def q412CheckpointTradeoff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 1000000").as("s"),
        ($"event_type" === "error").cast("long").as("fail"))
    val bounds = evs.agg(min($"s").as("t0"), max($"s").as("t1"))
    val fanned = evs.crossJoin(broadcast(bounds))
      .select($"s", $"fail", $"t0", $"t1",
        explode(array(Q412Intervals.map(i => lit(i)): _*)).as("i"))
    fanned.groupBy($"i")
      .agg(sum($"fail").as("n_failures"),
        max(expr("(t1 - t0) div i + 1")).as("n_checkpoints"),
        sum(expr("fail * ((s - t0) % i)")).as("lost_s"))
      .select($"i".as("interval_s"), $"n_failures", $"n_checkpoints",
        ($"n_checkpoints" * Q412Cost).as("overhead_s"), $"lost_s",
        ($"n_checkpoints" * Q412Cost + $"lost_s").as("total_s"))
      .orderBy($"interval_s")
  }

  def q412Sql: String = {
    val iList = Q412Intervals.map(i => s"(CAST($i AS BIGINT))").mkString(", ")
    s"""WITH evs AS (
          SELECT epoch_us(ts) // 1000000 AS s,
            CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS fail
          FROM events),
        bounds AS (SELECT min(s) AS t0, max(s) AS t1 FROM evs),
        fanned AS (
          SELECT s, fail, t0, t1, i
          FROM evs, bounds, (VALUES $iList) iv(i))
        SELECT i AS interval_s,
          CAST(sum(fail) AS BIGINT) AS n_failures,
          CAST(max((t1 - t0) // i + 1) AS BIGINT) AS n_checkpoints,
          CAST(max((t1 - t0) // i + 1) * $Q412Cost AS BIGINT)
            AS overhead_s,
          CAST(sum(fail * ((s - t0) % i)) AS BIGINT) AS lost_s,
          CAST(max((t1 - t0) // i + 1) * $Q412Cost
            + sum(fail * ((s - t0) % i)) AS BIGINT) AS total_s
        FROM fanned GROUP BY i ORDER BY interval_s"""
  }
}
