package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth relational wave — dataset profiling, explicit grouping sets,
  * order statistics (median + deterministic mode), and map-typed columns.
  * None of these exist in the reference (SURVEY §1.2 notes "no map
  * types"; §2.4 covers only plain GROUP BY + pivot), but they round out
  * the relational surface a user migrating off the reference expects.
  *
  * Scale posture: the profile and order-statistic queries are one
  * hash-aggregate over a pruned scan; grouping sets expand rows by the
  * number of sets BEFORE the shuffle (2× here — the same partial-agg
  * path as rollup/cube); the map explode is a narrow generator with no
  * added shuffle.
  */
object Relational4 {

  /** Column profiling — the first query every pipeline runs against a
    * new dataset: per column, null count, exact distinct count, and
    * min/max (stringified so heterogeneous column types share one output
    * schema). One scan: all per-column aggregates run in a single
    * hash-aggregate (multi-distinct goes through Catalyst's Expand),
    * then the single wide row unpivots to long form with `stack`. */
  def q76Profile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cols = Seq("event_id", "user_id", "event_type", "value")
    // Doubles stringify through a fixed-scale decimal: both engines'
    // native double→string formatters switch to scientific notation at
    // different thresholds (Spark at 1e7/1e-3, DuckDB elsewhere), which
    // would break the repr-strict oracle gate the moment min/max drifts
    // past one — DECIMAL(18,2)→VARCHAR is notation-stable in both.
    def asStr(v: Column, c: String): Column =
      (if (c == "value") v.cast("decimal(18,2)") else v).cast("string")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        asStr(min(col(c)), c).as(s"${c}_min"),
        asStr(max(col(c)), c).as(s"${c}_max"))
    }
    val wide = Tables.events(spark, sfDir).agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map(c =>
      s"'$c', ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max").mkString(", ")
    wide.select(expr(
        s"stack(${cols.size}, $stackExpr) AS (col_name, n_nulls, n_distinct, min_s, max_s)"))
      .orderBy($"col_name")
  }

  def q76Sql: String = {
    val cols = Seq("event_id", "user_id", "event_type", "value")
    def asStr(agg: String, c: String) =
      if (c == "value") s"CAST(CAST($agg($c) AS DECIMAL(18,2)) AS VARCHAR)"
      else s"CAST($agg($c) AS VARCHAR)"
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
          count(DISTINCT $c) AS n_distinct,
          ${asStr("min", c)} AS min_s,
          ${asStr("max", c)} AS max_s FROM events"""
    }.mkString("", " UNION ALL ", " ORDER BY col_name")
  }

  /** Explicit GROUPING SETS — the one grouping-set shape rollup/cube
    * (q31/q50) cannot express: independent single-column marginals with
    * no (all) or cross rows. Uses the Spark 4 `Dataset.groupingSets`
    * API; `grouping()` (1 ⇔ the column is collapsed in this set) drives
    * the sentinel, so a NULL data value can never masquerade as a
    * collapsed dimension — collision-proof without a non-null
    * precondition on the keys. */
  def q77GroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus")),
        $"l_returnflag", $"l_linestatus")
      .agg(Exact.sumExact($"l_quantity", 2).as("sum_qty"),
        count(lit(1)).as("counts"),
        grouping($"l_returnflag").as("g_rf"),
        grouping($"l_linestatus").as("g_ls"))
      .select(
        when($"g_rf" === 1, "(all)").otherwise($"l_returnflag").as("rf"),
        when($"g_ls" === 1, "(all)").otherwise($"l_linestatus").as("ls"),
        $"sum_qty", $"counts")
      .orderBy($"rf", $"ls")
  }

  def q77Sql: String =
    """SELECT CASE WHEN grouping(l_returnflag) = 1 THEN '(all)'
            ELSE l_returnflag END AS rf,
       CASE WHEN grouping(l_linestatus) = 1 THEN '(all)'
            ELSE l_linestatus END AS ls,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) / 100.0 AS sum_qty,
       count(*) AS counts
       FROM lineitem
       GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       ORDER BY rf, ls"""

  /** Order statistics per group: exact median and a DETERMINISTIC mode.
    * Median runs on integer cents so the even-count interpolation
    * (lo+hi)/2 is IEEE-exact on both engines, then one double division
    * scales back. Mode is hand-rolled (count per value-bucket → top-1 by
    * (count DESC, bucket ASC)) because built-in mode picks an arbitrary
    * value on ties — non-deterministic under shuffle reordering, which a
    * reproducible pipeline (and a cross-engine oracle) cannot accept.
    * Buckets use floor(cents / 1000.0) — NOT integer division — because
    * Spark `div` truncates toward zero while DuckDB `//` floors, and
    * the two diverge on negative operands (cents are exact in double up
    * to 2^52, the division is one IEEE op, so floor is bit-portable at
    * any sign). */
  def q78MedianMode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select($"event_type",
        Exact.cents($"value").as("cents"))
    val med = ev.groupBy($"event_type")
      .agg((median($"cents") / 100.0).as("median_value"))
    val w = Window.partitionBy($"event_type")
      .orderBy($"n".desc, $"bucket")
    val mode = ev
      .select($"event_type", floor($"cents" / 1000.0).as("bucket"))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"event_type", $"bucket".as("mode_bucket"), $"n".as("mode_n"))
    med.join(mode, Seq("event_type"))
      .orderBy($"event_type")
  }

  def q78Sql: String =
    """WITH c AS (
         SELECT event_type,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM events),
       med AS (
         SELECT event_type, median(cents) / 100.0 AS median_value
         FROM c GROUP BY event_type),
       md AS (
         SELECT event_type, bucket AS mode_bucket, n AS mode_n FROM (
           SELECT event_type,
             CAST(floor(cents / 1000.0) AS BIGINT) AS bucket, count(*) AS n,
             row_number() OVER (PARTITION BY event_type
               ORDER BY count(*) DESC, CAST(floor(cents / 1000.0) AS BIGINT)) AS rk
           FROM c GROUP BY 1, 2) t
         WHERE rk = 1)
       SELECT med.event_type AS event_type, median_value, mode_bucket, mode_n
       FROM med JOIN md ON med.event_type = md.event_type
       ORDER BY 1"""

  /** Map-typed columns end to end: parse the `props` JSON payload into a
    * real MapType (the reference parses into a fixed struct —
    * consumer.scala:64 — so dynamic keys are new surface), explode to
    * (key, value) rows, and aggregate per (event_type, key). The oracle
    * reaches the same rows via regexp extraction, proving the map path
    * against a map-free formulation. */
  def q82MapOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_type",
        explode(from_json($"props",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType))).as(Seq("k", "v")))
      // contract shared with the oracle: only integer-valued entries
      // count — a value failing LongType coercion (the regexp's \d+ on
      // the oracle side) drops the entry, not counted with a null
      .filter($"v".isNotNull)
      .groupBy($"event_type", $"k")
      .agg(count(lit(1)).as("counts"), sum($"v").as("sum_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy($"event_type", $"k")
  }

  // the value regexp is terminator-anchored ([,}] — RE2 has no
  // lookahead): a non-integer like {"k": 1.5} must NOT half-match as
  // '1' here, because the Spark side's LongType coercion nulls the whole
  // map and drops the row. The single-key-'k' assumption is enforced by
  // a corpus-contract spec (Relational4Spec), not assumed.
  def q82Sql: String =
    """SELECT event_type, 'k' AS k, count(*) AS counts,
       CAST(sum(CAST(regexp_extract(props, '"k": (-?\d+)[,}]', 1) AS BIGINT)) AS BIGINT) AS sum_v,
       min(CAST(regexp_extract(props, '"k": (-?\d+)[,}]', 1) AS BIGINT)) AS min_v,
       max(CAST(regexp_extract(props, '"k": (-?\d+)[,}]', 1) AS BIGINT)) AS max_v
       FROM events
       WHERE regexp_extract(props, '"k": (-?\d+)[,}]', 1) <> ''
       GROUP BY event_type ORDER BY event_type, k"""
}
