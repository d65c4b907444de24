package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second relational wave: the cheap-extension operators SURVEY §2.3/§7
  * flags as natural upgrades (rollup/grouping sets, distinct aggregates,
  * HLL sketches, semi/anti joins) plus the remaining reference surface
  * (P5 element_at, S8 producer fan-out).
  */
object Relational2 {

  /** Rollup (grouping-sets) aggregate — subtotals + grand total. Group
    * keys are coalesced to a sentinel so null-ordering differences
    * between engines can't bite the sort. */
  def q31Rollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(Exact.sumExact($"l_quantity", 2).as("sum_qty"),
        count(lit(1)).as("counts"))
      .select(
        coalesce($"l_returnflag", lit("(all)")).as("rf"),
        coalesce($"l_linestatus", lit("(all)")).as("ls"),
        $"sum_qty", $"counts")
      .orderBy($"rf", $"ls")
  }

  /** Exact distinct aggregate (the reference had none; SURVEY §2.3). */
  def q32DistinctAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("counts"))
      .orderBy($"l_returnflag")
  }

  /** HLL sketch (approx_count_distinct): the 100 TB-scale form of q32 —
    * one pass, fixed memory, no per-key exact state. No DuckDB twin with
    * matching estimates, so the query SELF-CHECKS (the q114/q117/q126
    * pattern, retrofitted so the whole inventory is oracle-gated): the
    * exact per-flag cardinality rides along and the estimate is emitted
    * as a boolean asserting it landed within 3× the configured relative
    * standard deviation — the oracle emits `true` literally, so a
    * drifting sketch hash-mismatches the gate. (3×rsd because rsd is a
    * standard deviation, not a hard bound — HLL's error is
    * probabilistic; the estimate is deterministic per dataset, so the
    * flag is stable once observed green at a given SF.) */
  val HllRsd = 0.02
  def q33ApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", HllRsd).as("approx_parts"),
        countDistinct($"l_partkey").as("n_exact"))
      .select($"l_returnflag", $"n_exact",
        (abs($"approx_parts" - $"n_exact") <= $"n_exact" * (3 * HllRsd))
          .as("within_bound"))
      .orderBy($"l_returnflag")
  }

  def q33Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
       true AS within_bound
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Left-semi join (EXISTS): customers having at least one open order. */
  def q34SemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val open = Tables.orders(spark, sfDir)
      .filter($"o_orderstatus" === "O")
      .select($"o_custkey")
    Tables.customer(spark, sfDir)
      .join(open, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("counts"))
      .orderBy($"c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): parts never shipped in bulk
    * (quantity ≥ 45 — every part ships at least once, so the unfiltered
    * anti join would be empty). */
  def q35AntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val shipped = Tables.lineitem(spark, sfDir)
      .filter($"l_quantity" >= 45)
      .select($"l_partkey")
    Tables.part(spark, sfDir)
      .join(shipped, $"p_partkey" === $"l_partkey", "left_anti")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("counts"))
      .orderBy($"p_brand")
  }

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont` — both sort-based linear interpolation; rounded to
    * absorb last-ulp libm differences). At 100 TB swap for
    * `percentile_approx` (fixed-memory sketch) — same query shape. */
  def q43Percentiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("qty_p90"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("price_p50"))
      .orderBy($"l_returnflag")
  }

  /** Skew-handling pattern: salted two-phase join. The big (skewed) side
    * derives a deterministic salt; the small side is replicated once per
    * salt value, so one hot key spreads over `Salts` reducer partitions
    * instead of one. Result is identical to the unsalted join — the
    * oracle IS the plain formulation. (AQE skew-join handles moderate
    * skew automatically; explicit salting is the belt-and-braces form for
    * pathological keys.) */
  val Salts = 8
  def q45SaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val dim = events.groupBy($"event_type")
      .agg(avg(when($"value" > 100, 1).otherwise(0)).as("hv_share"))
    val saltedDim = dim.withColumn("salt", explode(sequence(lit(0), lit(Salts - 1))))
    events
      // pmod, not %: Spark's % keeps the dividend's sign, so a negative
      // key would salt outside 0..Salts-1 and silently drop from the
      // inner join — a belt-and-braces skew helper must tolerate
      // arbitrary keys
      .withColumn("salt", pmod($"event_id", lit(Salts)).cast("int"))
      .join(saltedDim, Seq("event_type", "salt"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("counts"), round(first($"hv_share"), 6).as("hv_share"))
      .orderBy($"event_type")
  }

  /** Cube over both keys — all 4 grouping sets (q31's rollup gives 3).
    * Same sentinel-coalesce convention for engine-portable ordering. */
  def q50Cube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(Exact.sumExact($"l_quantity", 2).as("sum_qty"),
        count(lit(1)).as("counts"))
      .select(
        coalesce($"l_returnflag", lit("(all)")).as("rf"),
        coalesce($"l_linestatus", lit("(all)")).as("ls"),
        $"sum_qty", $"counts")
      .orderBy($"rf", $"ls")
  }

  /** Windowed moving aggregate with an explicit row frame: per-user
    * 3-row trailing mean of `value` plus running event count. Decimal
    * mean (sum/count over the frame) keeps it order-exact. */
  def q51MovingAvg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val frame = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trailing = frame.rowsBetween(-2, 0)
    Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"value")
      .withColumn("running_n", count(lit(1)).over(frame.rowsBetween(Window.unboundedPreceding, 0)))
      // trailing mean as (scaled-long sum) / (100 * n): both operands are
      // exact, so the single double division is bit-identical cross-engine
      .withColumn("ma3",
        (sum($"value".cast("decimal(18,2)")).over(trailing) * 100).cast("long") /
          (count(lit(1)).over(trailing) * lit(100.0)))
      .select($"user_id", $"event_id", $"running_n", $"ma3")
      .orderBy($"user_id", $"event_id")
  }

  /** As-of join composed from built-ins (preference (a) over a custom
    * SparkPlan — SURVEY §7.3): for each purchase, the most recent signup
    * by the same user at-or-before it. Union both sides, carry the last
    * non-null signup forward per user with last_value(ignoreNulls) over
    * an ordered window, keep the purchase rows. One shuffle on user_id —
    * the same cost profile a dedicated as-of join operator would have. */
  def q46AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .filter($"event_type".isin("purchase", "signup"))
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    ev
      .withColumn("signup_id",
        last(when($"event_type" === "signup", $"event_id"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase" && $"signup_id".isNotNull)
      .select($"user_id", $"event_id".as("purchase_id"), $"signup_id")
      .orderBy($"user_id", $"purchase_id")
  }

  /** P5/P3 (consumer.scala:68,128,153): array ops — element_at on the
    * token array (first/last token), array length. */
  def q36ArrayOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = graft.functions.TextFunctions.tokens($"text")
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        size(toks).as("n_toks"))
      .orderBy($"doc_id")
  }

  /** S8 (twitter_producer.py:57-67): producer fan-out — one output
    * message per (event, matching rule), key-prefixed, JSON-encoded value
    * built with deterministic concat (engine-portable, unlike to_json
    * field ordering). The rules table is inline (tag → predicate), the
    * explode is the per-rule duplication. */
  def q37FanOut(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Overlapping rules: every event matches "all"; purchases add "p";
    // high-value events add "hv" — so one input row fans out to 1-3
    // keyed messages, like the producer's per-matching-rule duplication.
    val tagged = Tables.events(spark, sfDir)
      .withColumn("tags", array(
        lit("all"),
        when($"event_type" === "purchase", "p").otherwise(lit(null).cast("string")),
        when($"value" > 100, "hv").otherwise(lit(null).cast("string"))))
      .withColumn("tag", explode(filter($"tags", t => t.isNotNull)))
    tagged.select(
        concat(upper($"tag"), lit(":"), $"event_id".cast("string")).as("key"),
        concat(lit("{\"event_id\":"), $"event_id".cast("string"),
          lit(",\"tag\":\""), $"tag", lit("\"}")).as("value"))
      .orderBy($"key")
  }
}
