package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eighteenth query wave: analytics shapes that are easy to write
  * quadratically and whose whole value is the linear plan — a
  * reduce-first Pareto skyline, a grid-partitioned spatial self-join,
  * deterministic weighted sampling, Welch's two-sample t-test from
  * exact moments, and market-basket affinity (support/confidence/lift).
  *
  * Cross-engine determinism posture (shared with the rest of the
  * engine): every pseudo-random draw is integer arithmetic on row ids
  * (portable between Spark and DuckDB), every money value rides the
  * cents grid ([[Exact.cents]]), and every float expression is written
  * with the SAME operation tree on both sides so each correctly-rounded
  * IEEE step lands on identical bits.
  */
object Relational11 {

  /** q154 — Pareto skyline over `part`: maximize retail price, minimize
    * size; a part is on the frontier iff no other part is ≥ price AND
    * ≤ size with one strict. The naive formulation is a quadratic
    * NOT-EXISTS self-join — a non-starter at catalog scale.
    *
    * Reduce-first plan: (1) group to distinct (size, price) points with
    * multiplicity — map-side combinable, collapses the table to at most
    * |sizes|×|prices| rows; (2) per size keep only the max-price point
    * (anything cheaper at the same size is dominated by it); (3) one
    * tiny running-max window over ≤|sizes| rows marks the frontier
    * (dominated iff some strictly-smaller size already reached ≥ this
    * price). The only shuffle over data-sized input is the first
    * aggregate; the window runs on a frame bounded by the DOMAIN of
    * size, not the row count — the property that survives 1000×
    * catalog growth. Reference analogue: the "best tweet per bucket"
    * leaderboards (spark-app consumer.scala:150-166) are 1-D versions
    * of this frontier. */
  def q154Skyline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pts = Tables.part(spark, sfDir)
      .select($"p_size".as("size"), Exact.cents($"p_retailprice").as("cents"))
    val byPoint = pts.groupBy($"size", $"cents").agg(count(lit(1)).as("n"))
    // max_by(struct) keeps the max-price point AND its multiplicity in
    // one pass; (size, cents) is unique after the group so no tie rule
    // is needed inside the struct ordering
    val perSize = byPoint.groupBy($"size")
      .agg(max(struct($"cents", $"n")).as("m"))
      .select($"size", $"m.cents".as("cents"), $"m.n".as("n"))
    val runmax = Window.orderBy($"size")
      .rowsBetween(Window.unboundedPreceding, -1)
    perSize
      .withColumn("prevmax", max($"cents").over(runmax))
      .filter($"prevmax".isNull || $"cents" > $"prevmax")
      .select($"size", $"cents".as("price_cents"), $"n".as("n_parts"))
      .orderBy($"size")
  }

  def q154Sql: String =
    """WITH pts AS (
         SELECT p_size AS size,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM part),
       bypoint AS (
         SELECT size, cents, CAST(count(*) AS BIGINT) AS n
         FROM pts GROUP BY 1, 2),
       persize AS (
         SELECT size, max(cents) AS cents FROM pts GROUP BY 1),
       top AS (
         SELECT p.size, p.cents, b.n
         FROM persize p JOIN bypoint b USING (size, cents)),
       flagged AS (
         SELECT size, cents, n,
           max(cents) OVER (ORDER BY size
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
         FROM top)
       SELECT size, cents AS price_cents, n AS n_parts
       FROM flagged WHERE prevmax IS NULL OR cents > prevmax
       ORDER BY size"""

  /** Grid cell width == match radius: any pair within distance R sits at
    * most one cell apart per axis, so a ±1 neighborhood join is
    * complete. */
  val Radius = 500L
  private val GridMod = 100000L

  /** Deterministic scatter of a row id onto the [0, 100000)² plane —
    * quadratic hashing mod primes, pure integer arithmetic so Spark and
    * DuckDB compute bit-identical coordinates (a real deployment reads
    * lat/lon columns instead; the join below is unchanged). */
  private def coordX(id: String) = expr(s"(($id * $id) % 99991 + $id * 13) % $GridMod")
  private def coordY(id: String) = expr(s"(($id * ($id + 7)) % 99989 + $id * 31) % $GridMod")

  /** q155 — spatial self-join: all event pairs within Euclidean distance
    * R, bucketed by distance. The naive plan is an O(n²) cross join; the
    * grid recipe replicates the LEFT side to its 3×3 cell neighborhood
    * (cell width = R), equi-joins on the cell id, and re-checks the
    * exact predicate in-join — the spatial sibling of q147's band join
    * and the standard distributed spatial-join layout (geo tiles at
    * scale). Each qualifying pair meets EXACTLY once: the right row is
    * at its home cell, and the left row's nine replicas are distinct
    * cells, so no post-join dedup is needed. Cost is 9× replication of
    * one side plus one hash shuffle — linear in points + true matches,
    * AQE-skew-splittable on dense cells. */
  def q155GridJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pts = Tables.events(spark, sfDir)
      .select($"event_id".as("id"),
        coordX("event_id").as("x"), coordY("event_id").as("y"))
    // single join key: cells are < 200 per axis, 1024 keeps (cx, cy)
    // collision-free including the −1 border replicas
    val right = pts.select($"id".as("idb"), $"x".as("xb"), $"y".as("yb"),
      expr(s"(x div $Radius) * 1024 + (y div $Radius)").as("cell"))
    val left = pts
      .withColumn("dxy", explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)))
      .select($"id".as("ida"), $"x".as("xa"), $"y".as("ya"),
        expr(s"(x div $Radius + dxy.dx) * 1024 + (y div $Radius + dxy.dy)").as("cell"))
    val d2 = ($"xa" - $"xb") * ($"xa" - $"xb") + ($"ya" - $"yb") * ($"ya" - $"yb")
    // shuffle-hash (the Similarity.candidateJoin discipline): this is
    // an AMPLIFYING cell-keyed candidate join — size-based planning
    // would broadcast the compact point frame and run the per-cell
    // pair fan-out at the probe side's parquet split count, and the
    // promised hash shuffle (AQE-skew-splittable on dense cells) would
    // silently never exist. Parallelism must come from the key
    // shuffle at every scale.
    left.join(right.hint("shuffle_hash"), "cell")
      .filter($"ida" < $"idb" && d2 <= Radius * Radius)
      .withColumn("dist_bucket", expr(
        "((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)) div 25000"))
      .select($"dist_bucket", $"ida")
      .groupBy($"dist_bucket")
      .agg(count(lit(1)).as("n_pairs"), countDistinct($"ida").as("n_anchors"))
      .orderBy($"dist_bucket")
  }

  def q155Sql: String =
    """WITH pts AS (
         SELECT event_id AS id,
           ((event_id * event_id) % 99991 + event_id * 13) % 100000 AS x,
           ((event_id * (event_id + 7)) % 99989 + event_id * 31) % 100000 AS y
         FROM events),
       pairs AS (
         SELECT a.id AS ida,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
         FROM pts a JOIN pts b
           ON a.id < b.id
          AND b.x BETWEEN a.x - 500 AND a.x + 500
          AND b.y BETWEEN a.y - 500 AND a.y + 500
         WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 250000)
       SELECT CAST(d2 // 25000 AS BIGINT) AS dist_bucket,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT ida) AS BIGINT) AS n_anchors
       FROM pairs GROUP BY 1 ORDER BY dist_bucket"""

  /** q156 — deterministic weighted sampling: top-3 documents per
    * language under a weight-biased priority key (the A-Res /
    * Efraimidis–Skrivas shape: each row draws u ∈ (0,1] and competes on
    * a weight-discounted key; heavier rows win more often). The draw is
    * a multiplicative hash of doc_id — integer, reproducible, portable —
    * and the key u/w is ONE double division of exact integers, so both
    * engines produce the identical correctly-rounded double and the
    * identical ranking. Scale posture: the per-group top-k runs as a
    * window with Spark's WindowGroupLimit map-side truncation — each
    * map task ships ≤ k rows per group, never the corpus. This is the
    * sampling verb a curation pipeline uses for weighted corpus mixing
    * (weights = quality scores or token counts). */
  def q156WeightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, sfDir)
      .select($"lang", $"doc_id", $"n_chars")
      .withColumn("u", ($"doc_id" * lit(2654435761L)) % 1000003L + 1L)
      .withColumn("key", $"u".cast("double") / $"n_chars")
    val w = Window.partitionBy($"lang").orderBy($"key".asc, $"doc_id".asc)
    keyed
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"lang", $"rk", $"doc_id", $"n_chars".as("weight"),
        round($"key", 6).as("priority"))
      .orderBy($"lang", $"rk")
  }

  def q156Sql: String =
    """WITH keyed AS (
         SELECT lang, doc_id, n_chars,
           CAST((doc_id * 2654435761) % 1000003 + 1 AS DOUBLE) / n_chars AS key
         FROM documents),
       ranked AS (
         SELECT lang, doc_id, n_chars, key,
           row_number() OVER (PARTITION BY lang ORDER BY key ASC, doc_id ASC) AS rk
         FROM keyed)
       SELECT lang, CAST(rk AS INT) AS rk, doc_id, n_chars AS weight,
         round(key, 6) AS priority
       FROM ranked WHERE rk <= 3 ORDER BY lang, rk"""

  /** q157 — Welch's two-sample t-test on `value` between every pair of
    * event types (unequal variances; the honest default for A/B
    * comparisons). Each group reduces to exact integer moments
    * (n, Σcents, Σcents²) in ONE map-side-combined aggregation — the
    * t-statistic and Welch–Satterthwaite df are then a fixed sequence
    * of double ops over a 5-row frame, written with the identical
    * operation tree in the oracle so every correctly-rounded step
    * matches bit-for-bit (final round(…,6) only shortens the repr).
    * Scale: the log is scanned once; the pairwise frame is |types|² —
    * statistics over 100 TB cost one aggregate, like q152's chi-square.
    * (At extreme counts the Σ² moment outgrows int64; the production
    * variant accumulates doubles, which only relaxes the oracle to
    * tolerance equality.) */
  def q157WelchTtest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = Tables.events(spark, sfDir)
      .select($"event_type", Exact.cents($"value").as("c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"), sum($"c" * $"c").as("s2"))
      .withColumn("mean", $"s".cast("double") / $"n".cast("double"))
      .withColumn("vr",
        ($"s2".cast("double") - $"s".cast("double") * $"mean")
          / ($"n" - 1).cast("double"))
    val a = m.select($"event_type".as("type_a"), $"n".as("na"),
      $"mean".as("ma"), $"vr".as("va"))
    val b = m.select($"event_type".as("type_b"), $"n".as("nb"),
      $"mean".as("mb"), $"vr".as("vb"))
    a.join(b, $"type_a" < $"type_b")
      .withColumn("sea", $"va" / $"na".cast("double"))
      .withColumn("seb", $"vb" / $"nb".cast("double"))
      .withColumn("se2", $"sea" + $"seb")
      .select($"type_a", $"type_b", $"na", $"nb",
        round($"ma", 6).as("mean_a"), round($"mb", 6).as("mean_b"),
        round(($"ma" - $"mb") / sqrt($"se2"), 6).as("t_stat"),
        round($"se2" * $"se2"
          / ($"sea" * $"sea" / ($"na" - 1).cast("double")
            + $"seb" * $"seb" / ($"nb" - 1).cast("double")), 6).as("df"))
      .orderBy($"type_a", $"type_b")
  }

  def q157Sql: String =
    """WITH m AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s,
           sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             * CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS s2
         FROM events GROUP BY 1),
       mm AS (
         SELECT event_type, n,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           (CAST(s2 AS DOUBLE)
             - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             / CAST(n - 1 AS DOUBLE) AS vr
         FROM m),
       pr AS (
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n AS na, b.n AS nb, a.mean AS ma, b.mean AS mb,
           a.vr / CAST(a.n AS DOUBLE) AS sea,
           b.vr / CAST(b.n AS DOUBLE) AS seb
         FROM mm a JOIN mm b ON a.event_type < b.event_type)
       SELECT type_a, type_b, na, nb,
         round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
         round((ma - mb) / sqrt(sea + seb), 6) AS t_stat,
         round((sea + seb) * (sea + seb)
           / (sea * sea / CAST(na - 1 AS DOUBLE)
             + seb * seb / CAST(nb - 1 AS DOUBLE)), 6) AS df
       FROM pr ORDER BY type_a, type_b"""

  /** q158 — market-basket affinity: for every pair of event types,
    * the co-occurrence support, directional confidence, and lift over
    * user baskets (basket = the set of types a user ever fired).
    *
    * Reduce-first: the log collapses to distinct (user, type) presence
    * rows — ONE combinable aggregate over the data — before any join;
    * the per-user self-join then has fan-out bounded by |types|²
    * per user (a constant), so pair generation is linear in users, and
    * the pair/total frames that meet afterwards are |types|-sized
    * (broadcast). The same shape at 100 TB: the only data-sized
    * shuffles are the presence dedup and the user-keyed pair join.
    * Reference analogue: hashtag co-occurrence over
    * tweets (the reference computes per-tag counts,
    * spark-app consumer.scala:150-166; lift is the pairwise extension). */
  def q158BasketLift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ut = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type").distinct()
    val totals = ut.groupBy($"event_type").agg(count(lit(1)).as("nt"))
    val nUsers = ut.select($"user_id").distinct()
      .agg(count(lit(1)).as("n_users"))
    val pairs = ut.as("a").join(ut.as("b"), "user_id")
      .filter($"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(totals.select($"event_type".as("type_a"), $"nt".as("n_a"))), "type_a")
      .join(broadcast(totals.select($"event_type".as("type_b"), $"nt".as("n_b"))), "type_b")
      .crossJoin(broadcast(nUsers))
      .select($"type_a", $"type_b", $"n_ab", $"n_a", $"n_b",
        round($"n_ab".cast("double") / $"n_users".cast("double"), 6).as("support"),
        round($"n_ab".cast("double") / $"n_a".cast("double"), 6).as("confidence"),
        round(($"n_ab".cast("double") * $"n_users".cast("double"))
          / ($"n_a".cast("double") * $"n_b".cast("double")), 6).as("lift"))
      .orderBy($"type_a", $"type_b")
  }

  def q158Sql: String =
    """WITH ut AS (
         SELECT DISTINCT user_id, event_type FROM events),
       totals AS (
         SELECT event_type, CAST(count(*) AS BIGINT) AS nt FROM ut GROUP BY 1),
       nu AS (
         SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
       pairs AS (
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_ab
         FROM ut a JOIN ut b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY 1, 2)
       SELECT type_a, type_b, n_ab, ta.nt AS n_a, tb.nt AS n_b,
         round(CAST(n_ab AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS support,
         round(CAST(n_ab AS DOUBLE) / CAST(ta.nt AS DOUBLE), 6) AS confidence,
         round((CAST(n_ab AS DOUBLE) * CAST(n_users AS DOUBLE))
           / (CAST(ta.nt AS DOUBLE) * CAST(tb.nt AS DOUBLE)), 6) AS lift
       FROM pairs
       JOIN totals ta ON ta.event_type = type_a
       JOIN totals tb ON tb.event_type = type_b
       CROSS JOIN nu
       ORDER BY type_a, type_b"""
}
