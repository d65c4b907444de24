package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator suite — the reference's exhaustive operator
  * inventory (SURVEY.md §2) re-expressed over the driver test tables.
  *
  * Conventions shared with the DuckDB oracles in [[graft.SparkEntry]]:
  *  - Every double-valued SUM goes through DECIMAL(18,2|4) so the result
  *    is exact and independent of accumulation order (double sums are
  *    order-sensitive; shuffles make the order nondeterministic at scale).
  *  - AVG of 0/1 flags stays double (integer-valued partial sums are exact
  *    below 2^53, so sum/count is bit-identical across engines).
  *  - Every query ends in a total ORDER BY over its key columns so row
  *    order is well-defined for hash comparison.
  *  - Aggregate columns are aliased identically in Spark and oracle SQL.
  *
  * Scale posture: group-bys here hash-shuffle on low-cardinality keys
  * (flags, statuses, types) — partial aggregation makes the shuffle a few
  * rows per partition regardless of input size. Dimension joins broadcast.
  */
object Relational {

  /** A1+A2+P7+P8 (consumer.scala:158-164): grouped conditional-share +
    * count — the reference's "positivity rate per topic", re-keyed to
    * `l_returnflag` with flag = discount > 0.05. */
  def q01FlagShareCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_discount")
      .groupBy($"l_returnflag")
      .agg(
        round(avg(when($"l_discount" > 0.05, 1).otherwise(0)), 4).as("disc_share"),
        count($"l_returnflag").as("counts"))
      .orderBy($"l_returnflag")
  }

  /** A3 (consumer.scala:168-169): two-key grouped count (the pre-pivot
    * grain). The reference mis-aliased the count column (SURVEY §2.3 A3);
    * we implement the intent. */
  def q02TwoKeyCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("counts"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** A4+P10 (consumer.scala:170): pivot to wide with explicit pivot values
    * (skips the value-inference distinct job — SURVEY §4) + na.fill(0).
    * Pivot values are the `l_linestatus` domain, mirroring the fixed
    * 6-emotion contract (wrangling.py:26-27). */
  def q03PivotWide(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity")
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("decimal(18,2)"))
      // na.fill IS the reference's null handling (consumer.scala:170) and
      // the single mechanism guaranteeing non-null cells below
      .na.fill(0)
      .select($"l_returnflag",
        Exact.decToDouble($"F", 2).as("F"),
        Exact.decToDouble($"O", 2).as("O"))
      .orderBy($"l_returnflag")
  }

  /** R1 (visualisation.py:19-20): melt/unpivot wide→long — inverse of q03,
    * built on Dataset.unpivot (Spark ≥3.4). */
  def q04UnpivotLong(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    q03PivotWide(spark, sfDir)
      .unpivot(Array(col("l_returnflag")), Array(col("F"), col("O")),
        "l_linestatus", "sum_qty")
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** J1 (consumer.scala:172-174): inner equi-join of two aggregates on the
    * group key. Uses `Seq(key)` join syntax to avoid the reference's
    * duplicate-column rename dance (`topic_agg`, consumer.scala:163).
    * Both sides are tiny post-aggregation → Catalyst/AQE broadcasts. */
  def q05JoinAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val rates = li.groupBy($"l_returnflag")
      .agg(round(avg(when($"l_discount" > 0.05, 1).otherwise(0)), 4).as("disc_share"),
        count(lit(1)).as("counts"))
    val wide = li.select($"l_returnflag", $"l_linestatus", $"l_quantity")
      .groupBy($"l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum($"l_quantity".cast("decimal(18,2)")).cast("decimal(18,2)"))
      .na.fill(0)
    rates.join(wide, Seq("l_returnflag"), "inner")
      .select($"l_returnflag", $"disc_share", $"counts",
        Exact.decToDouble($"F", 2).as("F"),
        Exact.decToDouble($"O", 2).as("O"))
      .orderBy($"l_returnflag")
  }

  /** A6+A8 (visualisation.py:21,35,58): percent-of-group via window
    * aggregate — `counts / sum(counts) over (partition by event_type)`.
    * The reference's pandas `transform('sum')` was buggy (SURVEY §2.3 A6);
    * this is the intent. */
  def q06WindowShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byDay = Tables.events(spark, sfDir)
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("date"))
      .groupBy($"event_type", $"date")
      .agg(count(lit(1)).as("counts"))
    byDay
      .withColumn("share",
        round($"counts" / sum($"counts").over(Window.partitionBy($"event_type")), 6))
      .orderBy($"event_type", $"date")
  }

  /** A5 (visualisation.py:27): grouped sum over multiple columns. */
  def q07GroupedSumMulti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        Exact.sumExact($"l_quantity", 2).as("sum_qty"),
        Exact.sumExact($"l_extendedprice", 2).as("sum_price"),
        Exact.sumExact($"l_discount", 4).as("sum_disc"))
      .orderBy($"l_returnflag")
  }

  /** P4+P12 (consumer.scala:69-70, wrangling.py:15-20): derived date/hour
    * partition columns via date_format — the tumbling-window-as-partition
    * pattern (T4). At scale these become the physical partition keys of
    * the raw store. */
  def q08TimeGrains(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        date_format($"ts", "yyyy-MM-dd").as("date"),
        date_format($"ts", "HH").as("hour"))
      .groupBy($"date", $"hour")
      .agg(count(lit(1)).as("counts"))
      .orderBy($"date", $"hour")
  }

  /** D1 (wrangling.py:24): keep-first dedup by key subset, made
    * deterministic: first = lowest event_id per (user_id, event_type)
    * (pandas drop_duplicates keeps encounter order; Spark dropDuplicates
    * keeps an arbitrary row — row_number pins the semantics). */
  def q09DedupFirst(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"event_id")
    Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .drop("rn")
      .orderBy($"user_id", $"event_type")
  }

  /** P11+P13+P14 (wrangling.py:25-28, twitter_producer.py:33): predicate
    * filter, column-subset projection, and the producer's string-prefix
    * key synthesis `TOPIC[:2].upper() + id`. */
  def q10FilterProject(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .filter($"event_type" =!= "error")
      .select(
        concat(upper(substring($"event_type", 1, 2)), $"event_id".cast("string")).as("key"),
        $"event_id", $"user_id", $"event_type")
      .orderBy($"event_id")
  }

  /** P1-P3 analogue (consumer.scala:63-68): schema-on-read extraction from
    * the raw JSON `props` payload. regexp_extract keeps the oracle
    * portable (DuckDB's JSON extension is not guaranteed offline); the
    * production path for nested payloads is from_json — exercised by the
    * streaming ingest pipeline and its spec instead. */
  def q11IngestProjection(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id", $"event_type",
        regexp_extract($"props", "\"k\": (\\d+)", 1).cast("long").as("k"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count(lit(1)).as("counts"))
      .orderBy($"event_type")
  }

  /** Star-schema join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region,
    * revenue per region. Beyond the reference's single J1 join — this is
    * the 100 TB shape: one big fact shuffle-joined up the key chain.
    * Only the fixed-size dims (nation=25, region=5 rows at any SF) are
    * explicitly broadcast; orders/customer scale with SF, so they
    * shuffle-join (AQE still broadcasts them at small SF). */
  def q12StarJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", ($"l_extendedprice" * (lit(1) - $"l_discount"))
        .cast("decimal(18,4)").as("rev"))
    val o = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_nationkey")
    val n = Tables.nation(spark, sfDir).select($"n_nationkey", $"n_name", $"n_regionkey")
    val r = Tables.region(spark, sfDir).select($"r_regionkey", $"r_name")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(Exact.decToDouble(sum($"rev"), 4).as("revenue"), count(lit(1)).as("counts"))
      .orderBy($"r_name")
  }

  /** Deterministic top-k: ORDER BY value with full tiebreak + LIMIT. */
  def q13TopkOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey",
        Exact.decToDouble($"o_totalprice".cast("decimal(18,2)"), 2).as("o_totalprice"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }
}
