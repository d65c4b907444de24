package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third relational wave — set operators, outer joins, the ranking-window
  * family, arg-min/max aggregates, histogramming, and deterministic
  * stratified sampling. None of these exist in the reference (SURVEY §2.4
  * notes "no union/intersect/except", §2.5 "no other join kinds"), but a
  * user replacing it with this library gets them as first-class, and a
  * training-data pipeline leans on sampling + histograms constantly.
  *
  * Scale posture: set ops and the outer join shuffle on their key like any
  * aggregate; ranking windows shuffle once per partition key; the sample
  * filter is a pure map (pushed to the scan) — no operator here adds a
  * second shuffle.
  */
object Relational3 {

  /** Distinct set algebra over per-type user sets: INTERSECT / EXCEPT /
    * UNION, each reduced to a count so the result is scale-stable. All
    * three branches share one events scan per side and stay in a single
    * plan (no driver-side counts). */
  def q52SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    def users(t: String) = ev.filter($"event_type" === t).select($"user_id").distinct()
    val p = users("purchase")
    val e = users("error")
    def counted(df: DataFrame, op: String) =
      df.agg(count(lit(1)).as("n_users")).withColumn("op", lit(op))
    counted(p.intersect(e), "both")
      .unionByName(counted(p.union(e).distinct(), "either"))
      .unionByName(counted(p.except(e), "purchase_only"))
      .select($"op", $"n_users")
      .orderBy($"op")
  }

  def q52Sql: String =
    """WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
       e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
       SELECT 'both' AS op, count(*) AS n_users
         FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
       UNION ALL
       SELECT 'either', count(*)
         FROM (SELECT user_id FROM p UNION SELECT user_id FROM e)
       UNION ALL
       SELECT 'purchase_only', count(*)
         FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
       ORDER BY op"""

  /** Full-outer join: hourly purchase counts vs hourly error counts —
    * hours where either side is absent surface with a 0 from coalesce
    * (the grain is sparse enough that both directions of missingness
    * occur). */
  def q53OuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    def byHour(t: String, n: String) = ev.filter($"event_type" === t)
      .groupBy(
        date_format($"ts", "yyyy-MM-dd").as("date"),
        date_format($"ts", "HH").as("hour"))
      .agg(count(lit(1)).as(n))
    byHour("purchase", "p_n")
      .join(byHour("error", "e_n"), Seq("date", "hour"), "full_outer")
      .select($"date", $"hour",
        coalesce($"p_n", lit(0L)).as("p_n"),
        coalesce($"e_n", lit(0L)).as("e_n"))
      .orderBy($"date", $"hour")
  }

  def q53Sql: String =
    """WITH p AS (
         SELECT strftime(ts, '%Y-%m-%d') AS date, strftime(ts, '%H') AS hour,
           count(*) AS p_n
         FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       e AS (
         SELECT strftime(ts, '%Y-%m-%d') AS date, strftime(ts, '%H') AS hour,
           count(*) AS e_n
         FROM events WHERE event_type = 'error' GROUP BY 1, 2)
       SELECT coalesce(p.date, e.date) AS date, coalesce(p.hour, e.hour) AS hour,
         coalesce(p_n, 0) AS p_n, coalesce(e_n, 0) AS e_n
       FROM p FULL JOIN e ON p.date = e.date AND p.hour = e.hour
       ORDER BY date, hour"""

  /** Ranking-window family over orders per customer: rank / dense_rank
    * (peer groups by price — tie-stable since rank depends only on the
    * ordering VALUES), ntile + lag/lead (position-dependent, so their
    * window adds the unique-key tiebreak). */
  def q54RankFamily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val peers = Window.partitionBy($"o_custkey").orderBy($"o_totalprice")
    val total = Window.partitionBy($"o_custkey").orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey",
        rank().over(peers).as("rnk"),
        dense_rank().over(peers).as("drnk"),
        ntile(4).over(total).as("quartile"),
        lag($"o_orderkey", 1).over(total).as("prev_ok"),
        lead($"o_orderkey", 1).over(total).as("next_ok"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  def q54Sql: String =
    """SELECT o_custkey, o_orderkey,
       rank() OVER peers AS rnk,
       dense_rank() OVER peers AS drnk,
       ntile(4) OVER total AS quartile,
       lag(o_orderkey, 1) OVER total AS prev_ok,
       lead(o_orderkey, 1) OVER total AS next_ok
       FROM orders
       WINDOW peers AS (PARTITION BY o_custkey ORDER BY o_totalprice),
         total AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_custkey, o_orderkey"""

  /** Composite ordering key for arg-min/max: fixed-width zero-padded
    * (value-in-cents, event_id) — lexicographic order == (value, id)
    * order, portable to DuckDB's VARCHAR-keyed arg_max (which lacks
    * struct keys), and the id tiebreak makes ties deterministic. Cents
    * are biased by +10^11 before formatting so negative values stay in
    * lexicographic order too (a raw '-' would sort before '0' and invert
    * magnitude order); the bias covers value ∈ (-$10^9, +$89×10^8]. */
  private val ArgKeyBias = 100000000000L
  /** NULL-propagating: format_string would print a literal "null" (which
    * sorts before every digit and would elect a NULL-valued row as the
    * minimum) while DuckDB's printf yields NULL (arg_min skips the row)
    * — the explicit guard makes both engines skip NULL values. */
  private def argKey(value: Column, id: Column): Column =
    when(value.isNotNull && id.isNotNull,
      format_string("%012d%010d",
        Exact.cents(value) + lit(ArgKeyBias), id))

  /** arg-min/max aggregates (Spark max_by/min_by ≡ DuckDB
    * arg_max/arg_min): the event carrying each type's extreme value. */
  def q55ArgMinMax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        max_by($"event_id", argKey($"value", $"event_id")).as("max_value_event"),
        min_by($"event_id", argKey($"value", $"event_id")).as("min_value_event"),
        Exact.decToDouble(max($"value".cast("decimal(18,2)")), 2).as("max_value"))
      .orderBy($"event_type")
  }

  def q55Sql: String = {
    val key = "printf('%012d%010d', CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000000000, event_id)"
    s"""SELECT event_type,
        arg_max(event_id, $key) AS max_value_event,
        arg_min(event_id, $key) AS min_value_event,
        CAST(max(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) / 100.0 AS max_value
        FROM events GROUP BY event_type ORDER BY event_type"""
  }

  /** Fixed-width histogram of `value` (bucket = floor(v / 50)): the
    * profile pass every data pipeline runs before thresholding. floor of
    * an IEEE division is bit-portable, so buckets match exactly. */
  def q56Histogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(floor($"value" / 50.0).cast("long").as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("counts"))
      .orderBy($"bucket")
  }

  def q56Sql: String =
    """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, count(*) AS counts
       FROM events GROUP BY 1 ORDER BY bucket"""

  /** Deterministic ~5% stratified sample via an md5 hash of the row key —
    * reproducible across engines and runs (unlike Dataset.sample's
    * seeded-RNG-per-partition, which is not stable under repartitioning),
    * and decorrelated from id-assignment patterns (a linear congruence
    * over sequential ids can bias per stratum when ids correlate with
    * event_type or time). First two hex chars < '0d' keeps 13/256 ≈
    * 5.08%. At 100 TB the same predicate is a pure map pushed into the
    * scan. */
  def q57StratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .filter(substring(md5($"event_id".cast("string")), 1, 2) < "0d")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_sampled"), countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type")
  }

  def q57Sql: String =
    """SELECT event_type, count(*) AS n_sampled,
       count(DISTINCT user_id) AS n_users
       FROM events WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 2) < '0d'
       GROUP BY event_type ORDER BY event_type"""

  /** Correlated scalar subquery, run through Spark SQL so Catalyst's
    * decorrelation rewrites it (to a windowed/joined form — the same
    * shape a hand-written DataFrame version would use): orders whose
    * price exceeds their customer's average. The comparison is kept in
    * exact arithmetic as `price × n > sum(price)` over decimals — an
    * order-independent equivalent of `price > avg(price)` that cannot
    * flip on a float boundary under shuffle reordering. */
  def q58CorrelatedSubq(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT o_orderstatus, count(*) AS n_above
         FROM graft_orders o
         WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
               (SELECT count(*) FROM graft_orders o2
                WHERE o2.o_custkey = o.o_custkey)
             > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
                FROM graft_orders o2 WHERE o2.o_custkey = o.o_custkey)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  def q58Sql: String =
    """SELECT o_orderstatus, count(*) AS n_above
       FROM orders o
       WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
             (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
           > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
              FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Distribution-position windows (percent_rank = (rank-1)/(n-1),
    * cume_dist = peers/n): both are single-division functions of exact
    * integer operands, so the doubles are bit-portable without rounding. */
  def q60PercentRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"value")
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"value",
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .select($"user_id", $"event_id", $"pr", $"cd")
      .orderBy($"user_id", $"event_id")
  }

  def q60Sql: String =
    """SELECT user_id, event_id,
       percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS pr,
       cume_dist() OVER (PARTITION BY user_id ORDER BY value) AS cd
       FROM events ORDER BY user_id, event_id"""

  /** Time-series gap fill / resample: a dense (event_type × hour) grid
    * between the stream's global bounds, zero-filled where no events
    * landed — the calendar-axis densification every downstream
    * visualization or forecasting join needs (the reference's viz layer
    * implicitly assumes it). Hours are integral epoch buckets end to
    * end; only the final label converts back to a timestamp string.
    * Scale posture: the grid is (hours × types) — tiny at any data
    * volume; the only big input is the pre-aggregated actuals, which
    * arrive already reduced to the same tiny grain, so the outer join is
    * never a big-side shuffle problem. */
  def q64GapFill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val HourUs = 3600000000L
    val ev = Tables.events(spark, sfDir)
      .select($"event_type", expr(s"unix_micros(ts) div $HourUs").as("h"))
    val bounds = ev.agg(min($"h").as("h0"), max($"h").as("h1"))
    val grid = bounds
      .select(explode(sequence($"h0", $"h1")).as("h"))
      .crossJoin(broadcast(ev.select($"event_type").distinct()))
    val actual = ev.groupBy($"event_type", $"h").agg(count(lit(1)).as("n"))
    grid.join(actual, Seq("event_type", "h"), "left_outer")
      .select($"event_type",
        Exact.tsString(timestamp_micros($"h" * HourUs)).as("ws"),
        coalesce($"n", lit(0L)).as("counts"))
      .orderBy($"event_type", $"ws")
  }

  def q64Sql: String =
    """WITH bounds AS (
         SELECT (epoch_us(min(ts)) // 3600000000) AS h0,
                (epoch_us(max(ts)) // 3600000000) AS h1 FROM events),
       grid AS (
         SELECT unnest(range((SELECT h0 FROM bounds), (SELECT h1 FROM bounds) + 1)) AS h),
       actual AS (
         SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS n
         FROM events GROUP BY 1, 2)
       SELECT t.event_type,
         strftime(make_timestamp(g.h * 3600000000), '%Y-%m-%d %H:%M:%S') AS ws,
         coalesce(a.n, 0) AS counts
       FROM grid g
       CROSS JOIN (SELECT DISTINCT event_type FROM events) t
       LEFT JOIN actual a ON a.event_type = t.event_type AND a.h = g.h
       ORDER BY t.event_type, ws"""

  /** Time-based RANGE window frame: per event, count and sum of the same
    * user's events in the trailing hour (inclusive) — the rolling-rate
    * feature a training pipeline computes for rate limiting or burst
    * detection. ROWS frames (q51) bound by position; this bounds by
    * event-time distance, so bursty users get wide frames and idle users
    * narrow ones. Ordering key is integral epoch micros on both engines. */
  def q66RangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val HourUs = 3600000000L
    val w = Window.partitionBy($"user_id").orderBy($"us")
      .rangeBetween(-HourUs, 0)
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"value",
        expr("unix_micros(ts)").as("us"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("v_1h",
        Exact.decToDouble(sum($"value".cast("decimal(18,2)")).over(w), 2))
      .select($"user_id", $"event_id", $"n_1h", $"v_1h")
      .orderBy($"user_id", $"event_id")
  }

  def q66Sql: String =
    """SELECT user_id, event_id,
       count(*) OVER w AS n_1h,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w * 100 AS BIGINT) / 100.0 AS v_1h
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       ORDER BY user_id, event_id"""

  /** Batch range (interval) join — the q42 stream-stream join's batch
    * twin, sharing its oracle: errors within 2 hours after a purchase by
    * the same user. Catalyst plans equi-key + range predicate as a
    * SortMergeJoin on user_id with the interval condition evaluated in
    * the join — one shuffle per side, no nested loop. */
  def q65RangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"event_id".as("p_id"))
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id".as("e_user"), $"ts".as("e_ts"), $"event_id".as("e_id"))
    purchases.join(errors,
        $"user_id" === $"e_user" &&
          $"e_ts" >= $"p_ts" && $"e_ts" <= $"p_ts" + expr("INTERVAL 2 HOURS"))
      .select($"user_id", $"p_id", $"e_id",
        expr("(unix_micros(e_ts) - unix_micros(p_ts)) div 1000000").as("gap_s"))
      .orderBy($"user_id", $"p_id", $"e_id")
  }

  /** q46's as-of join run through the NATIVE operator
    * ([[graft.plans.AsOf]]: custom LogicalPlan → SparkStrategy →
    * sort-merge SparkPlan) instead of the union+window composition —
    * result-identical by construction (same (ts, id) tiebreak), so it
    * shares q46's oracle. One merge pass over two co-sorted sides vs two
    * window passes over the union. */
  def q61AsofNative(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("s_ts"), $"event_id".as("signup_id"))
    graft.plans.AsOf.join(purchases, signups,
        keys = Seq("user_id"),
        leftOrder = Seq("ts", "event_id"),
        rightOrder = Seq("s_ts", "signup_id"),
        payload = Seq("signup_id"))
      .select($"user_id", $"event_id".as("purchase_id"), $"signup_id")
      .orderBy($"user_id", $"purchase_id")
  }

  /** Deterministic per-group sample: k rows per event_type chosen by
    * md5-hash priority — reservoir-sampling semantics (uniform-ish,
    * stable across runs/engines/partitionings) without RNG state. The
    * inspect-k-examples-per-class query every pipeline dashboard runs.
    * Scale note: the partition key has only ~5 values, but the
    * `rank <= k` filter makes Spark plan a WindowGroupLimit, which
    * truncates to k rows per group ON THE MAP SIDE before the exchange
    * — the reducers sort k·mappers rows, not the corpus (verified in
    * PLANS.md; q38's TopKAggregator is the same idea as an explicit
    * aggregate). */
  def q74GroupSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy(md5($"event_id".cast("string")), $"event_id")
    Tables.events(spark, sfDir)
      .select($"event_type", $"event_id", $"user_id")
      .withColumn("pick", row_number().over(w))
      .filter($"pick" <= 5)
      .select($"event_type", $"pick", $"event_id", $"user_id")
      .orderBy($"event_type", $"pick")
  }

  def q74Sql: String =
    """SELECT event_type, pick, event_id, user_id FROM (
         SELECT event_type, event_id, user_id,
           row_number() OVER (PARTITION BY event_type
             ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS pick
         FROM events) t
       WHERE pick <= 5 ORDER BY event_type, pick"""

  /** Cohort conversion: for each signup-date cohort, the share of users
    * whose first signup was followed by a purchase within 7 days. Exact
    * integer counts and one double division — the funnel-rate shape of
    * product analytics, built on the same event-time interval semantics
    * as the as-of and range joins. */
  def q75CohortConversion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val firstSignup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("s_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    val converted = firstSignup.join(purchases,
        $"user_id" === $"p_user" &&
          $"p_ts" >= $"s_ts" && $"p_ts" <= $"s_ts" + expr("INTERVAL 7 DAYS"),
        "left_semi")
      .select($"user_id").withColumn("conv", lit(1L))
    firstSignup.join(converted, Seq("user_id"), "left_outer")
      .groupBy(date_format($"s_ts", "yyyy-MM-dd").as("cohort"))
      .agg(count(lit(1)).as("n_signups"),
        count($"conv").as("n_converted"))
      .withColumn("rate", $"n_converted".cast("double") / $"n_signups")
      .orderBy($"cohort")
  }

  def q75Sql: String =
    """WITH fs AS (
         SELECT user_id, min(ts) AS s_ts FROM events
         WHERE event_type = 'signup' GROUP BY user_id),
       conv AS (
         SELECT fs.user_id FROM fs
         WHERE EXISTS (
           SELECT 1 FROM events p
           WHERE p.event_type = 'purchase' AND p.user_id = fs.user_id
             AND p.ts >= fs.s_ts AND p.ts <= fs.s_ts + INTERVAL 7 DAY))
       SELECT strftime(s_ts, '%Y-%m-%d') AS cohort,
         count(*) AS n_signups,
         count(*) FILTER (WHERE fs.user_id IN (SELECT user_id FROM conv)) AS n_converted,
         CAST(count(*) FILTER (WHERE fs.user_id IN (SELECT user_id FROM conv)) AS DOUBLE)
           / count(*) AS rate
       FROM fs GROUP BY 1 ORDER BY cohort"""
}
