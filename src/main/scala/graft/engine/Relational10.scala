package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixteenth query wave: the join/maintenance shapes that remain after
  * Relational9 — a pure-inequality (theta) join made shuffle-joinable,
  * full MERGE INTO upsert semantics, and a sliding-window distinct
  * count — each one an operation a warehouse cannot express as a plain
  * equi-join + aggregate without the specific plan discipline shown
  * here.
  */
object Relational10 {

  /** Band width (cents) and the shift that keeps bucket arithmetic on
    * non-negative integers (acctbal ≥ −999.99 ⇒ cents ≥ −99 999). */
  val BandCents = 1000L
  private val BandShift = 100000L

  /** q147 — banded theta join: customers matched to suppliers with
    * |c_acctbal − s_acctbal| ≤ $10, a predicate with NO equi key.
    *
    * The naive plan is a cartesian product (BroadcastNestedLoopJoin) —
    * quadratic and a non-starter at 100 TB. The band trick restores an
    * equi key: bucket each side by floor(cents / W) with W equal to the
    * band width, replicate the LEFT side to its bucket ± 1 (|a−b| ≤ W
    * bounds the bucket distance by 1), equi-join on the bucket, and
    * re-check the exact predicate in-join. Each qualifying pair meets
    * in EXACTLY one bucket (the right side exists at one bucket; the
    * left's three replicas are distinct), so no post-join dedup is
    * needed. Cost: 3× replication of one side + one hash shuffle —
    * linear, AQE-skew-splittable, and the generic recipe for any
    * proximity theta join (time bands, geo tiles, price corridors).
    *
    * All arithmetic is integer cents on the shared decimal grid
    * ([[Exact.cents]]); the shift to non-negative buckets sidesteps the
    * Spark-div-vs-DuckDB-floor divergence on negatives. */
  def q147BandJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
      .select($"c_nationkey", $"c_custkey",
        Exact.cents($"c_acctbal").as("cc"))
      .withColumn("cb", expr(s"(cc + $BandShift) div $BandCents"))
    val supp = Tables.supplier(spark, sfDir)
      .select($"s_suppkey", Exact.cents($"s_acctbal").as("sc"))
      .withColumn("b", expr(s"(sc + $BandShift) div $BandCents"))
    cust
      .select($"c_nationkey", $"c_custkey", $"cc",
        explode(array($"cb" - 1, $"cb", $"cb" + 1)).as("b"))
      .join(supp, "b")
      .filter(abs($"cc" - $"sc") <= BandCents)
      .groupBy($"c_nationkey".as("nation"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"s_suppkey").as("n_sup"),
        countDistinct($"c_custkey").as("n_cust"))
      .orderBy($"nation")
  }

  def q147Sql: String =
    """SELECT c_nationkey AS nation,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_sup,
         CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_cust
       FROM customer c JOIN supplier s
         ON abs(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
              - CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) <= 1000
       GROUP BY 1 ORDER BY nation"""

  /** q148 — MERGE INTO semantics (the Delta/Iceberg upsert verb) from
    * plain Spark: base state ⊕ change set with INSERT / UPDATE / DELETE
    * arms, via one full-outer join.
    *
    * Base = each user's latest event value in the first half of the log
    * (by event_id — the log's total order); changes = the second half,
    * reduced to one action per user: DELETE if the user's last event is
    * an 'error' (account closed), else UPSERT to the latest value.
    * Full-outer join on user_id, one CASE per arm:
    * matched+delete → drop, matched+upsert → update, unmatched change →
    * insert, unmatched base → keep. The audit action column makes the
    * row's provenance part of the oracle-checked contract.
    *
    * Scale posture: both sides reduce to |users| rows BEFORE the join
    * (max_by aggregation with map-side partial combine — the log itself
    * is never shuffled twice), and the join shuffles the key space, not
    * the log. This is exactly the merge a lakehouse runs per batch; the
    * reduction-first discipline is what keeps it O(|keys|) not O(|log|). */
  def q148MergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type",
        Exact.cents($"value").as("cents"))
    val mid = ev.agg(expr("max(event_id) div 2").as("m"))
    val withHalf = ev.crossJoin(broadcast(mid))
    val base = withHalf.filter($"event_id" <= $"m")
      .groupBy($"user_id")
      .agg(max_by($"cents", $"event_id").as("base_cents"))
    val delta = withHalf.filter($"event_id" > $"m")
      .groupBy($"user_id")
      .agg(max_by($"cents", $"event_id").as("new_cents"),
        (max_by($"event_type", $"event_id") === "error").as("is_delete"))
    // deleted keys stay visible with NULL state — the row a CDC
    // downstream would consume as a tombstone
    base.join(delta, Seq("user_id"), "full_outer")
      .select($"user_id",
        when($"is_delete".isNull, lit("keep"))
          .when($"is_delete" && $"base_cents".isNotNull, lit("delete"))
          .when($"is_delete", lit("noop_delete"))
          .when($"base_cents".isNull, lit("insert"))
          .otherwise(lit("update")).as("action"),
        when($"is_delete".isNull, $"base_cents")
          .when($"is_delete", lit(null).cast("long"))
          .otherwise($"new_cents").as("cents"))
      .orderBy($"user_id", $"action")
  }

  def q148Sql: String =
    """WITH ev AS (
         SELECT event_id, user_id, event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events),
       mid AS (SELECT max(event_id) // 2 AS m FROM ev),
       base AS (
         SELECT user_id, max_by(cents, event_id) AS base_cents
         FROM ev, mid WHERE event_id <= m GROUP BY user_id),
       delta AS (
         SELECT user_id, max_by(cents, event_id) AS new_cents,
           max_by(event_type, event_id) = 'error' AS is_delete
         FROM ev, mid WHERE event_id > m GROUP BY user_id),
       merged AS (
         SELECT coalesce(b.user_id, d.user_id) AS user_id,
           CASE WHEN d.user_id IS NULL THEN 'keep'
                WHEN d.is_delete AND b.user_id IS NOT NULL THEN 'delete'
                WHEN d.is_delete THEN 'noop_delete'
                WHEN b.user_id IS NULL THEN 'insert'
                ELSE 'update' END AS action,
           CASE WHEN d.user_id IS NULL THEN b.base_cents
                WHEN d.is_delete THEN NULL
                ELSE d.new_cents END AS cents
         FROM base b FULL OUTER JOIN delta d USING (user_id))
       SELECT user_id, action,
         CASE WHEN action IN ('delete', 'noop_delete') THEN NULL
              ELSE cents END AS cents
       FROM merged ORDER BY user_id, action"""

  private val HourUs = 3600000000L

  /** q149 — sliding-window distinct count: distinct users per event
    * type over the TRAILING 24 hours, one row per (type, hour) the
    * window is non-empty.
    *
    * `count(DISTINCT …) OVER (RANGE …)` does not exist in Spark (or
    * most engines) because distinct state cannot slide; the scalable
    * rewrite is: dedupe to (type, user, hour) presence rows FIRST (one
    * map-side-combinable aggregation that collapses the log), then
    * fan each presence row out to the ≤24 target hours it can serve
    * (bounded explode — interval arithmetic, no self-join of the raw
    * log), then count DISTINCT users per (type, target hour). The
    * explode factor is the window length in grain units — fixed — so
    * cost is O(|presence| · 24), independent of event volume per hour;
    * the naive hour×hour range self-join is O(|hours|²) state and the
    * raw-log window sort is O(|log| log |log|) per key.
    *
    * Hours are integral epoch-hour buckets (μs floor-div — the q64
    * recipe); target hours clamp to the data's max hour so the output
    * never projects past the corpus. */
  def q149SlidingDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pres = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id",
        expr(s"unix_micros(ts) div $HourUs").as("h"))
      .distinct()
    val hmax = pres.agg(max($"h").as("hmax"))
    pres.crossJoin(broadcast(hmax))
      .select($"event_type", $"user_id",
        explode(sequence($"h", least($"h" + 23, $"hmax"))).as("th"))
      .groupBy($"event_type", $"th")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"event_type", $"th")
  }

  /** KMV sketch size for q150 — shared with the oracle SQL. */
  val KmvSetK = 32

  /** q150 — KMV set-operation cardinalities: two overlapping extracts
    * of the event log (first 60% / last 60% by event_id) summarized as
    * min-k sketches, then |A|, |B|, |A∪B|, |A∩B| estimated FROM THE
    * SKETCHES ALONE — q139's anti-entropy question ("how much do two
    * replicas share?") answered by exchanging k longs per side instead
    * of the sets.
    *
    * The algebra: min_k(A∪B) = min_k(min_k(A) ∪ min_k(B)) (take the k
    * smallest of the merged sketches), so the union estimate composes
    * without re-scanning; the intersection uses the Beyer et al.
    * estimator |A∩B| ≈ ρ·|A∪B| with ρ = |K(A∪B) ∩ K_A ∩ K_B| / k —
    * here kept in INTEGER arithmetic (cnt·est_union div k) so the
    * oracle reproduces it bit-for-bit. Min-k sets are order-independent
    * under update AND merge, which is what makes the whole row exactly
    * reproducible (q127's property, extended to set algebra). Exact
    * counts ride the same single scan as conditional aggregates — the
    * estimate's error is part of the oracle-checked output.
    *
    * Scale posture: each side's sketch is a k-long partial per
    * partition (map-side combined); the final set math is O(k) on one
    * row. At 100 TB this is THE way to answer overlap questions across
    * stores/regions — ship 256 B, not the key sets. */
  def q150KmvSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = KmvSetK
    val ids = Tables.events(spark, sfDir).select($"event_id").distinct()
    val bounds = ids.agg(
      expr("(6 * max(event_id)) div 10").as("a_hi"),
      expr("(4 * max(event_id)) div 10").as("b_lo"))
    val one = ids
      .select($"event_id",
        conv(substring(md5($"event_id".cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"))
      .crossJoin(broadcast(bounds))
      .agg(
        graft.functions.KmvAggregate.kmvMinima(
          when($"event_id" <= $"a_hi", $"hv"), k).as("ska"),
        graft.functions.KmvAggregate.kmvMinima(
          when($"event_id" >= $"b_lo", $"hv"), k).as("skb"),
        count(when($"event_id" <= $"a_hi", lit(1))).as("exact_a"),
        count(when($"event_id" >= $"b_lo", lit(1))).as("exact_b"),
        count(lit(1)).as("exact_union"),
        count(when($"event_id" <= $"a_hi" && $"event_id" >= $"b_lo", lit(1)))
          .as("exact_inter"))
      .withColumn("sku",
        slice(array_sort(array_distinct(concat($"ska", $"skb"))), 1, k))
    def est(s: String): String =
      s"CASE WHEN size($s) < $k THEN CAST(size($s) AS BIGINT) " +
        s"ELSE (${(k - 1).toLong} * 4294967296) div element_at($s, $k) END"
    one.select(
      expr(est("ska")).as("est_a"),
      expr(est("skb")).as("est_b"),
      expr(est("sku")).as("est_union"),
      expr(s"(CAST(size(array_intersect(array_intersect(sku, ska), skb)) " +
        s"AS BIGINT) * (${est("sku")})) div least($k, size(sku))")
        .as("est_inter"),
      $"exact_a", $"exact_b", $"exact_union", $"exact_inter")
  }

  def q150Sql: String = {
    val k = KmvSetK
    def est(s: String): String =
      s"CASE WHEN len($s) < $k THEN CAST(len($s) AS BIGINT) " +
        s"ELSE (${(k - 1).toLong} * 4294967296) // $s[$k] END"
    s"""WITH ids AS (SELECT DISTINCT event_id FROM events),
       bounds AS (
         SELECT (6 * max(event_id)) // 10 AS a_hi,
                (4 * max(event_id)) // 10 AS b_lo
         FROM ids),
       hv AS (
         SELECT event_id,
           list_reduce(list_transform(range(1, 9), i ->
             strpos('0123456789abcdef',
               substr(md5(CAST(event_id AS VARCHAR)), CAST(i AS INT), 1)) - 1),
             (a, b) -> a * 16 + b) AS hv
         FROM ids),
       ska AS (
         SELECT list(hv ORDER BY hv) AS s FROM (
           SELECT DISTINCT hv.hv FROM hv, bounds WHERE event_id <= a_hi
           ORDER BY hv LIMIT $k)),
       skb AS (
         SELECT list(hv ORDER BY hv) AS s FROM (
           SELECT DISTINCT hv.hv FROM hv, bounds WHERE event_id >= b_lo
           ORDER BY hv LIMIT $k)),
       sku AS (
         SELECT list(hv ORDER BY hv) AS s FROM (
           SELECT DISTINCT hv FROM (
             SELECT unnest(ska.s) AS hv FROM ska
             UNION SELECT unnest(skb.s) AS hv FROM skb)
           ORDER BY hv LIMIT $k)),
       ex AS (
         SELECT
           CAST(count(CASE WHEN event_id <= a_hi THEN 1 END) AS BIGINT)
             AS exact_a,
           CAST(count(CASE WHEN event_id >= b_lo THEN 1 END) AS BIGINT)
             AS exact_b,
           CAST(count(*) AS BIGINT) AS exact_union,
           CAST(count(CASE WHEN event_id <= a_hi AND event_id >= b_lo
             THEN 1 END) AS BIGINT) AS exact_inter
         FROM ids, bounds)
       SELECT
         CAST(${est("ska.s")} AS BIGINT) AS est_a,
         CAST(${est("skb.s")} AS BIGINT) AS est_b,
         CAST(${est("sku.s")} AS BIGINT) AS est_union,
         CAST((CAST(len(list_intersect(list_intersect(sku.s, ska.s), skb.s))
             AS BIGINT) * (${est("sku.s")})) // least($k, len(sku.s))
           AS BIGINT) AS est_inter,
         exact_a, exact_b, exact_union, exact_inter
       FROM ska, skb, sku, ex"""
  }

  /** q151 — linear-interpolation resample: the hourly 'purchase'
    * revenue series densified to EVERY hour between its first and last
    * observation, missing hours filled by interpolating between the
    * nearest observed neighbors (q64's zero-fill answers "no data =
    * zero"; a rate/gauge series needs "no data = in between").
    *
    * Mechanics: dense grid (sequence over the known bounds) left-joined
    * to the observed hours, then four IGNORE-NULLS value windows — last
    * observed (value, hour) looking back, first observed looking
    * forward — and one interpolation expression. All inputs are exact
    * integers (cents, hour indices); the interpolated value is
    * prev + (Δv·Δh)/span with the int64 products formed BEFORE the one
    * IEEE division, so both engines round identically (q121's one-
    * float-op discipline).
    *
    * Scale posture: the series is already |hours|-sized — tiny — so the
    * unpartitioned window sort is bounded by the grid, never the log
    * (the log collapses in the first aggregation). A per-key panel
    * (sensor × hour at 100 TB) gets `partitionBy(key)` on every window
    * and the same expressions. */
  def q151Interpolate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val known = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .groupBy(expr(s"unix_micros(ts) div $HourUs").as("h"))
      .agg(sum(Exact.cents($"value")).as("cents"))
    val bounds = known.agg(min($"h").as("h0"), max($"h").as("h1"))
    val grid = bounds.select(explode(sequence($"h0", $"h1")).as("h"))
    val back = Window.orderBy($"h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.orderBy($"h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid.join(known, Seq("h"), "left")
      .withColumn("pv", last($"cents", ignoreNulls = true).over(back))
      .withColumn("ph",
        last(when($"cents".isNotNull, $"h"), ignoreNulls = true).over(back))
      .withColumn("nv", first($"cents", ignoreNulls = true).over(fwd))
      .withColumn("nh",
        first(when($"cents".isNotNull, $"h"), ignoreNulls = true).over(fwd))
      .select($"h",
        when($"cents".isNotNull, $"cents".cast("double"))
          .otherwise($"pv".cast("double") +
            (($"nv" - $"pv") * ($"h" - $"ph")).cast("double")
              / ($"nh" - $"ph").cast("double")).as("val"),
        $"cents".isNotNull.as("observed"))
      .orderBy($"h")
  }

  def q151Sql: String =
    s"""WITH known AS (
         SELECT epoch_us(ts) // $HourUs AS h,
           CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS cents
         FROM events WHERE event_type = 'purchase' GROUP BY 1),
       grid AS (
         SELECT unnest(range(min(h), max(h) + 1)) AS h FROM known),
       g AS (
         SELECT grid.h, k.cents FROM grid LEFT JOIN known k USING (h)),
       w AS (
         SELECT h, cents,
           last_value(cents IGNORE NULLS) OVER
             (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS pv,
           last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
             OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS ph,
           first_value(cents IGNORE NULLS) OVER
             (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS nv,
           first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
             OVER (ORDER BY h ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS nh
         FROM g)
       SELECT h,
         CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
              ELSE CAST(pv AS DOUBLE)
                + CAST((nv - pv) * (h - ph) AS DOUBLE)
                  / CAST(nh - ph AS DOUBLE) END AS val,
         cents IS NOT NULL AS observed
       FROM w ORDER BY h"""

  /** q152 — chi-square independence audit over the documents corpus:
    * is `lang` distributed independently of `source`? The dataset-
    * composition diagnostic run before mixing sources (a large χ²
    * says per-source language balancing is needed).
    *
    * Contingency table = the DENSE source × lang grid (zero cells
    * contribute their expectation), expected counts e = r·c/n with the
    * int64 product formed before one IEEE division, per-cell
    * contribution (o−e)²/e three further IEEE ops on identical
    * operands, and the total folded over cells in (source, lang) order
    * — a sequential fold both engines replay exactly, because float
    * addition's non-associativity makes an unordered SUM engine-
    * dependent (the q133 moment discipline, extended to a statistic
    * that cannot stay integer).
    *
    * Scale posture: the observed table reduces in ONE map-side-combined
    * aggregation; everything after is |sources|×|langs| — matrix-sized.
    * The ordered fold is over that same tiny grid, never data-sized. */
  def q152ChiSquare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"source", $"lang")
    val obs = docs.groupBy($"source", $"lang").agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy($"source").agg(sum($"o").as("r"))
    val colT = obs.groupBy($"lang").agg(sum($"o").as("c"))
    val tot = obs.agg(sum($"o").as("n"),
      countDistinct($"source").as("ns"), countDistinct($"lang").as("nl"))
    val cells = rowT.crossJoin(broadcast(colT))
      .join(obs, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("e", ($"r" * $"c").cast("double") / $"n".cast("double"))
      .withColumn("contrib",
        ($"o".cast("double") - $"e") * ($"o".cast("double") - $"e") / $"e")
    cells.agg(
      aggregate(
        transform(
          array_sort(collect_list(struct($"source", $"lang", $"contrib"))),
          x => x.getField("contrib")),
        lit(0.0), (acc, v) => acc + v).as("chi2_raw"),
      first($"ns").as("ns"), first($"nl").as("nl"), first($"n").as("n"))
      .select(round($"chi2_raw", 6).as("chi2"),
        (($"ns" - 1) * ($"nl" - 1)).as("dof"), $"n")
  }

  def q152Sql: String =
    """WITH obs AS (
         SELECT source, lang, CAST(count(*) AS BIGINT) AS o
         FROM documents GROUP BY 1, 2),
       rt AS (SELECT source, sum(o) AS r FROM obs GROUP BY 1),
       ct AS (SELECT lang, sum(o) AS c FROM obs GROUP BY 1),
       tot AS (
         SELECT CAST(sum(o) AS BIGINT) AS n,
           CAST(count(DISTINCT source) AS BIGINT) AS ns,
           CAST(count(DISTINCT lang) AS BIGINT) AS nl
         FROM obs),
       cells AS (
         SELECT rt.source, ct.lang,
           COALESCE(obs.o, 0) AS o,
           CAST(rt.r * ct.c AS DOUBLE) / CAST(tot.n AS DOUBLE) AS e
         FROM rt CROSS JOIN ct
         LEFT JOIN obs ON obs.source = rt.source AND obs.lang = ct.lang
         CROSS JOIN tot),
       contribs AS (
         SELECT list(
             (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
             ORDER BY source, lang) AS cs
         FROM cells)
       SELECT
         round(list_reduce(cs, (a, b) -> a + b), 6) AS chi2,
         (ns - 1) * (nl - 1) AS dof, n
       FROM contribs, tot"""

  /** q153 — constraint audit: the nightly data-quality suite (PK
    * uniqueness, FK orphan counts, NOT-NULL and domain checks) as ONE
    * relational result — a row per constraint with checked/violation
    * counts, so downstream gating is a filter on `ok`.
    *
    * Plan shapes per constraint class: PK uniqueness = count vs
    * count(DISTINCT) in one aggregate (no join); FK orphans = LEFT ANTI
    * join against the parent's key set (broadcast while the parent is
    * dimension-sized, shuffle-joinable when not — never a collect);
    * NOT-NULL/domain = conditional counts riding a single scan. Checks
    * against the same table share its scan where the shape allows
    * (lineitem's domain check rides the PK aggregate's scan).
    *
    * The acctbal domain check FAILS on TPC-H-shaped data (negative
    * balances exist) — deliberately, so the audit demonstrably detects
    * violations rather than vacuously passing. Scale: every branch
    * reduces to one row before the union; total output = |constraints|. */
  def q153ConstraintAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    def row(name: String, checked: Column, viol: Column, df: DataFrame) =
      df.agg(checked.cast("long").as("checked"), viol.cast("long").as("violations"))
        .select(lit(name).as("constraint"), $"checked", $"violations",
          ($"violations" === 0).as("ok"))
    val pkOrders = row("pk_orders_orderkey",
      count(lit(1)), count(lit(1)) - countDistinct($"o_orderkey"), orders)
    val pkLineitem = row("pk_lineitem_orderkey_linenumber",
      count(lit(1)),
      count(lit(1)) - countDistinct($"l_orderkey", $"l_linenumber"), lineitem)
    val pkCustomer = row("pk_customer_custkey",
      count(lit(1)), count(lit(1)) - countDistinct($"c_custkey"), customer)
    def orphans(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String) =
      // no broadcast pin: the parent key set is Θ(parent rows), so the
      // scaladoc's "broadcast while dimension-sized, shuffle-joinable
      // when not" is AQE's runtime size decision, not a static hint
      row(name, max(lit(null).cast("long")), count(lit(1)),
        child.select(col(key))
          .join(parent.select(col(pkey).as(key)).distinct(),
            Seq(key), "left_anti"))
    val fkOrders = orphans("fk_orders_custkey", orders, "o_custkey",
      customer, "c_custkey")
    val fkLineitem = orphans("fk_lineitem_orderkey", lineitem, "l_orderkey",
      orders, "o_orderkey")
    val nnProps = row("nn_events_props",
      count(lit(1)), count(when($"props".isNull, 1)),
      Tables.events(spark, sfDir))
    val domQty = row("dom_lineitem_quantity_1_50",
      count(lit(1)),
      count(when($"l_quantity" < 1 || $"l_quantity" > 50, 1)), lineitem)
    val domBal = row("dom_customer_acctbal_nonneg",
      count(lit(1)), count(when($"c_acctbal" < 0, 1)), customer)
    Seq(pkOrders, pkLineitem, pkCustomer, fkOrders, fkLineitem,
      nnProps, domQty, domBal)
      .reduce(_ unionByName _)
      .orderBy($"constraint")
  }

  def q153Sql: String =
    """WITH checks AS (
         SELECT 'pk_orders_orderkey' AS cname,
           CAST(count(*) AS BIGINT) AS checked,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
         FROM orders
       UNION ALL
         SELECT 'pk_lineitem_orderkey_linenumber',
           CAST(count(*) AS BIGINT),
           CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
         FROM lineitem
       UNION ALL
         SELECT 'pk_customer_custkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
         FROM customer
       UNION ALL
         SELECT 'fk_orders_custkey', NULL,
           CAST(count(*) AS BIGINT)
         FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
       UNION ALL
         SELECT 'fk_lineitem_orderkey', NULL,
           CAST(count(*) AS BIGINT)
         FROM lineitem
         WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
       UNION ALL
         SELECT 'nn_events_props', CAST(count(*) AS BIGINT),
           CAST(count(CASE WHEN props IS NULL THEN 1 END) AS BIGINT)
         FROM events
       UNION ALL
         SELECT 'dom_lineitem_quantity_1_50', CAST(count(*) AS BIGINT),
           CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
             AS BIGINT)
         FROM lineitem
       UNION ALL
         SELECT 'dom_customer_acctbal_nonneg', CAST(count(*) AS BIGINT),
           CAST(count(CASE WHEN c_acctbal < 0 THEN 1 END) AS BIGINT)
         FROM customer)
       SELECT cname AS "constraint", checked, violations,
         violations = 0 AS ok
       FROM checks ORDER BY cname"""

  def q149Sql: String =
    """WITH pres AS (
         SELECT DISTINCT event_type, user_id,
           epoch_us(ts) // 3600000000 AS h
         FROM events),
       hmax AS (SELECT max(h) AS hm FROM pres),
       expanded AS (
         SELECT event_type, user_id, h + x AS th
         FROM pres, hmax,
           (SELECT unnest(range(0, 24)) AS x)
         WHERE h + x <= hm)
       SELECT event_type, th,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM expanded GROUP BY 1, 2 ORDER BY event_type, th"""
}
