package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-third query wave: transition dwell times, integer-exact
  * changepoint detection, the TPC-H Q3 join topology, and a
  * deadline-bounded conversion funnel.
  */
object Relational16 {

  /** q178 — transition dwell times: for every (from, to) event-type
    * pair, how long a user typically sits between the two — the TIMING
    * layer over q101's transition-count matrix (a Markov chain with
    * expected holding times is a semi-Markov model; this computes its
    * parameters). One lag window on the shared user-sequence
    * partitioning yields (prev_type, gap); the mean is one double
    * division of exact integer μs sums, min/max stay integer. The
    * |types|² result frame needs no further care. */
  def q178DwellTimes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("prev_type", lag($"event_type", 1).over(seq))
      .withColumn("gap_us",
        unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(seq))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"),
        round(sum($"gap_us").cast("double")
          / count(lit(1)).cast("double") / lit(1000000.0), 6)
          .as("mean_gap_s"),
        min($"gap_us").as("mn_us"), max($"gap_us").as("mx_us"))
      .select($"prev_type", $"next_type", $"n", $"mean_gap_s",
        expr("mn_us div 1000").as("min_gap_ms"),
        expr("mx_us div 1000").as("max_gap_ms"))
      .orderBy($"prev_type", $"next_type")
  }

  def q178Sql: String =
    """WITH seq AS (
         SELECT lag(event_type, 1) OVER w AS prev_type, event_type,
           epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT prev_type, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n,
         round(CAST(sum(gap_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
           / 1000000.0, 6) AS mean_gap_s,
         CAST(min(gap_us) // 1000 AS BIGINT) AS min_gap_ms,
         CAST(max(gap_us) // 1000 AS BIGINT) AS max_gap_ms
       FROM seq WHERE prev_type IS NOT NULL
       GROUP BY 1, 2 ORDER BY prev_type, next_type"""

  /** q179 — integer-exact CUSUM changepoint: for each event type, the
    * day where the cumulative deviation of daily spend from the
    * period mean peaks — the classic mean-shift detector, made exactly
    * engine-reproducible by clearing denominators: instead of
    * S_k = Σ(x_i − x̄) (a float drift accumulator), compute
    * T_k = n·Σ_{i≤k} x_i − k·Σx — pure int64 (cents·rows fits
    * comfortably), so the argmax day is bit-exact, no float enters
    * until the reported magnitude is scaled back at the end. The log
    * reduces to |type×day| sums in one combinable aggregate; the
    * prefix sums and argmax run per type over ≤|days| rows. */
  def q179Cusum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
        Exact.cents($"value").as("c"))
      .groupBy($"event_type", $"day")
      .agg(sum($"c").as("x"))
    val tot = daily.groupBy($"event_type")
      .agg(sum($"x").as("sx"), count(lit(1)).as("nd"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val t = daily.join(tot, "event_type")
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("px", sum($"x").over(w))
      .withColumn("t_k", $"nd" * $"px" - $"k" * $"sx")
    // the ×1000−k key is a total order: |T| values are integers ≥1 apart,
    // so the k term (≤ |days| ≪ 1000) only breaks exact-|T| ties toward
    // the EARLIER day — argmax is unambiguous in both engines
    t.groupBy($"event_type")
      .agg(max_by($"day", abs($"t_k") * 1000 - $"k").as("peak_day"),
        max(abs($"t_k")).as("peak_abs"),
        first($"nd").as("n_days"), first($"sx").as("total_cents"))
      .withColumn("peak_mean_dev_cents",
        round($"peak_abs".cast("double")
          / $"n_days".cast("double"), 6))
      .select($"event_type", $"peak_day", $"n_days", $"total_cents",
        $"peak_mean_dev_cents")
      .orderBy($"event_type")
  }

  def q179Sql: String =
    """WITH daily AS (
         SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS x
         FROM events GROUP BY 1, 2),
       tot AS (
         SELECT event_type, CAST(sum(x) AS BIGINT) AS sx,
           CAST(count(*) AS BIGINT) AS nd
         FROM daily GROUP BY 1),
       pre AS (
         SELECT d.event_type, day, nd, sx,
           CAST(row_number() OVER w AS BIGINT) AS k,
           CAST(sum(x) OVER w AS BIGINT) AS px
         FROM daily d JOIN tot USING (event_type)
         WINDOW w AS (PARTITION BY d.event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       scored AS (
         SELECT event_type, day, nd, sx,
           abs(nd * px - k * sx) AS a, k
         FROM pre),
       best AS (
         SELECT event_type,
           max_by(day, a * 1000 - k) AS peak_day,
           max(a) AS peak_abs,
           max(nd) AS n_days, max(sx) AS total_cents
         FROM scored GROUP BY 1)
       SELECT event_type, peak_day, CAST(n_days AS BIGINT) AS n_days,
         CAST(total_cents AS BIGINT) AS total_cents,
         round(CAST(peak_abs AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
           AS peak_mean_dev_cents
       FROM best ORDER BY event_type"""

  /** q180 — the TPC-H Q3 topology (shipping-priority): a doubly-
    * filtered three-way join — selective predicates on BOTH dimension
    * sides (market-segment slice of customer, date slice of orders)
    * meeting lineitem — followed by top-10 revenue. The join-ordering
    * benchmark shape: Catalyst pushes both filters into their scans
    * and AQE picks broadcast for the shrunken sides, so the fact table
    * streams through two broadcast joins with ZERO fact-side shuffles
    * before the aggregate (q12 is the star version; Q3's point is that
    * the filters — not table sizes — decide the build sides). Revenue
    * rides the exact cents grid; the final sort handles 10 rows. */
  def q180ShippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("1997-06-01").cast("timestamp")
    val cust = Tables.customer(spark, sfDir)
      .filter($"c_nationkey" < 10).select($"c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" > cut)
      .select($"l_orderkey",
        (Exact.cents($"l_extendedprice")
          * (lit(100L) - Exact.cents($"l_discount"))).as("rev"))
    // no broadcast hints: the filtered sides are only small AFTER the
    // predicates apply, which is AQE's call to make from runtime stats
    // (at 100 TB the date slice of orders outgrows broadcast and the
    // join correctly becomes a shuffle join on orderkey)
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum($"rev").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
      .select($"l_orderkey", Exact.tsString($"o_orderdate").as("o_orderdate"),
        $"revenue")
  }

  def q180Sql: String =
    """SELECT l_orderkey,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)))
           AS BIGINT) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_nationkey < 10
         AND o_orderdate < TIMESTAMP '1997-06-01'
         AND l_shipdate > TIMESTAMP '1997-06-01'
       GROUP BY 1, 2
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Conversion deadline in hours. */
  val DeadlineHours = 24L

  /** q181 — deadline-bounded conversion: of each day's signups, how
    * many purchased within 24 h — the funnel with an expiry clock
    * (q134's ordered funnel has no deadline; retention q106 buckets by
    * day, not elapsed time). One forward-looking IGNORE-NULLS window
    * per user finds the next purchase time after each signup; the
    * deadline test and cohort rollup are then integer μs arithmetic.
    * Same single user-keyed shuffle as every sequence query; cohort
    * frame is |days| rows. */
  def q181ConversionDeadline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fwd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_purchase_us",
        first(when($"event_type" === "purchase", unix_micros($"ts")),
          ignoreNulls = true).over(fwd))
      .filter($"event_type" === "signup")
      .withColumn("converted",
        $"next_purchase_us".isNotNull &&
          $"next_purchase_us" - unix_micros($"ts")
            <= DeadlineHours * 3600000000L)
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_signups"),
        sum(when($"converted", 1L).otherwise(0L)).as("n_converted"),
        round(sum(when($"converted", 1L).otherwise(0L)).cast("double")
          / count(lit(1)).cast("double"), 6).as("conversion_rate"))
      .orderBy($"day")
  }

  def q181Sql: String =
    """WITH seq AS (
         SELECT user_id, ts, event_type,
           first_value(CASE WHEN event_type = 'purchase'
               THEN epoch_us(ts) END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
             AS next_purchase_us
         FROM events),
       s AS (
         SELECT strftime(ts, '%Y-%m-%d') AS day,
           CASE WHEN next_purchase_us IS NOT NULL
                 AND next_purchase_us - epoch_us(ts) <= 24 * 3600000000
                THEN 1 ELSE 0 END AS converted
         FROM seq WHERE event_type = 'signup')
       SELECT day, CAST(count(*) AS BIGINT) AS n_signups,
         CAST(sum(converted) AS BIGINT) AS n_converted,
         round(CAST(sum(converted) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           AS conversion_rate
       FROM s GROUP BY 1 ORDER BY day"""
}
