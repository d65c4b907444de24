package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thirty-second query wave: the last classic TPC-H join topologies not
  * yet represented (Q9 product profit, Q10 returned-item top-N, Q14
  * conditional revenue share, Q15 argmax-of-aggregate), adapted to this
  * corpus's reduced schema exactly as Relational23 adapts Q2/Q7/etc
  * (no partsupp/ps_supplycost — margin is plain discounted revenue; no
  * l_commitdate/l_receiptdate — date windows run on l_shipdate), plus a
  * two-level mergeable-sketch rollup (q224) — the pre-aggregated-cube
  * pattern that makes distinct-count maintainable at 100 TB.
  *
  * Shared conventions (Relational23's): money on the integer-cents
  * grid (Exact.cents), revenue on the DECIMAL(18,4) grid, ratios as
  * integer cross-multiplications, and a total ORDER BY on every output.
  */
object Relational24 {

  val Q220NameToken = "widget" // p_name substring selecting ~half of part

  /** q220 — TPC-H Q9 topology (product profit by nation and year): for
    * one product family (p_name contains "widget"), discounted revenue
    * by supplying nation and order year. Q9's three-way
    * part×supplier×orders binding around lineitem, minus ps_supplycost
    * (no partsupp table — profit reduces to revenue).
    *
    * Scale: part (name-filtered) and supplier⋈nation are broadcast —
    * the ONLY fact-sized exchange is the lineitem⋈orders shuffle on
    * orderkey, and the filter-before-broadcast means the stream side is
    * pre-thinned by the part family. Group-by lands on ~(nations ×
    * years) rows. At 1000 executors: one fact shuffle, everything else
    * map-side. */
  def q220ProductProfit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables.part(spark, sfDir)
      .filter($"p_name".contains(Q220NameToken))
      .select($"p_partkey")
    val supps = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,4)").as("rev"))
      .join(broadcast(parts), $"l_partkey" === $"p_partkey")
      .join(broadcast(supps), $"l_suppkey" === $"s_suppkey")
      .join(Tables.orders(spark, sfDir)
        .select($"o_orderkey", year($"o_orderdate").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name", $"o_year")
      .agg(Exact.decToDouble(sum($"rev"), 4).as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy($"n_name", $"o_year".desc)
  }

  def q220Sql: String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,4))) * 10000 AS BIGINT) / 10000.0 AS profit,
          CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%$Q220NameToken%'
        GROUP BY 1, 2 ORDER BY n_name, o_year DESC"""

  val Q221Lo = "1996-01-01"
  val Q221Hi = "1996-04-01" // exclusive
  val Q221TopN = 20

  /** q221 — TPC-H Q10 topology (returned-item reporting): the top-20
    * customers by revenue lost to returns ('R' lineitems) on orders
    * placed in one quarter. Fact⋈fact⋈dim with a selective flag filter
    * and a deterministic top-N.
    *
    * Scale: both fact sides are pre-thinned BEFORE the orderkey shuffle
    * (returnflag filter on lineitem, date window on orders); customer
    * and nation broadcast onto the post-aggregate (~|customers in
    * window| rows, not |lineitem|). Top-N is a global sort of an
    * already-small aggregate with a custkey tiebreak (cents grid →
    * exact ties → deterministic LIMIT). */
  def q221ReturnedItems(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val lost = Tables.lineitem(spark, sfDir)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,4)").as("rev"))
      .join(Tables.orders(spark, sfDir)
        .filter($"o_orderdate" >= lit(Q221Lo).cast("timestamp") &&
          $"o_orderdate" < lit(Q221Hi).cast("timestamp"))
        .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg((sum($"rev") * 10000).cast("long").as("lost_units"))
    lost
      .join(broadcast(Tables.customer(spark, sfDir)
        .join(Tables.nation(spark, sfDir), $"c_nationkey" === $"n_nationkey")
        .select($"c_custkey", $"c_name", $"n_name",
          Exact.cents($"c_acctbal").as("acctbal_cents"))),
        $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"n_name", $"acctbal_cents",
        $"lost_units")
      .orderBy($"lost_units".desc, $"c_custkey")
      .limit(Q221TopN)
  }

  def q221Sql: String =
    s"""SELECT c_custkey, c_name, n_name,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS acctbal_cents,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,4))) * 10000 AS BIGINT) AS lost_units
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '$Q221Lo 00:00:00'
          AND o_orderdate < TIMESTAMP '$Q221Hi 00:00:00'
        GROUP BY 1, 2, 3, 4
        ORDER BY lost_units DESC, c_custkey LIMIT $Q221TopN"""

  val Q222Year = 1998

  /** q222 — TPC-H Q14 topology (promo revenue share): per ship month of
    * one year, the fraction of revenue from PROMO-type parts, as exact
    * integer basis points (promo·10⁴ div total on the 10⁻⁴-revenue
    * grid) — Q14's percentage without a float division on the compared
    * path.
    *
    * Scale: part (2 columns) broadcasts; the year filter prunes the
    * lineitem scan before the join; one group-by on 12 keys. The
    * conditional sum is a map-side partial — no second pass for the
    * denominator. */
  def q222PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .filter(year($"l_shipdate") === Q222Year)
      .select($"l_partkey", month($"l_shipdate").as("m"),
        ($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(18,4)").as("rev"))
      .join(broadcast(Tables.part(spark, sfDir)
        .select($"p_partkey", $"p_type")), $"l_partkey" === $"p_partkey")
      .groupBy($"m")
      .agg(
        (sum(when($"p_type" === "PROMO", $"rev").otherwise(lit(0).cast("decimal(18,4)")))
          * 10000).cast("long").as("promo_units"),
        (sum($"rev") * 10000).cast("long").as("total_units"))
      .withColumn("promo_bps",
        expr("promo_units * 10000L div total_units"))
      .orderBy($"m")
  }

  def q222Sql: String =
    s"""SELECT CAST(month(l_shipdate) AS BIGINT) AS m,
          CAST(sum(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT)
            AS promo_units,
          CAST(sum(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_units,
          CAST(sum(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) * 10000
            // CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(18,4))) * 10000 AS BIGINT) AS promo_bps
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE year(l_shipdate) = $Q222Year
        GROUP BY 1 ORDER BY m"""

  val Q223Lo = "1997-01-01"
  val Q223Hi = "1997-04-01" // exclusive

  /** q223 — TPC-H Q15 topology (top supplier): the supplier(s) whose
    * revenue over one quarter equals the maximum over all suppliers —
    * Q15's view + correlated max as an aggregate⋈scalar.
    *
    * Scale: one shuffle (supplier group-by over the date-pruned scan);
    * the scalar max is a 1-row frame CROSS-broadcast onto the ~|supplier|
    * aggregate — never a single-partition window over the fact. Ties
    * all surface (same as Q15), made deterministic by the integer
    * revenue grid + suppkey order. */
  def q223TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val revs = Tables.lineitem(spark, sfDir)
      .filter($"l_shipdate" >= lit(Q223Lo).cast("timestamp") &&
        $"l_shipdate" < lit(Q223Hi).cast("timestamp"))
      .groupBy($"l_suppkey")
      .agg((sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
        .cast("decimal(18,4)")) * 10000).cast("long").as("rev_units"))
    val top = revs.agg(max($"rev_units").as("max_units"))
    revs.join(broadcast(top), $"rev_units" === $"max_units")
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"rev_units")
      .orderBy($"s_suppkey")
  }

  def q223Sql: String =
    s"""WITH revs AS (
          SELECT l_suppkey,
            CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_units
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '$Q223Lo 00:00:00'
            AND l_shipdate < TIMESTAMP '$Q223Hi 00:00:00'
          GROUP BY 1)
        SELECT s_suppkey, s_name, rev_units
        FROM revs JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_units = (SELECT max(rev_units) FROM revs)
        ORDER BY s_suppkey"""

  val Q224K = 32

  /** q224 — two-level mergeable-sketch rollup: KMV distinct-user
    * sketches built once per (event_type, day) cell, then re-aggregated
    * WITHOUT touching raw data to (a) per-type and (b) corpus-total
    * estimates. KMV's merge is EXACT — min_k(A∪B) = min_k(min_k(A) ∪
    * min_k(B)), every global k-smallest hash is k-smallest in its own
    * cell — so the rolled-up estimate equals the single-pass estimate
    * bit-for-bit, and the oracle computes the direct estimate for both
    * columns (est_merged/est_direct agreeing IS the assertion).
    *
    * Scale: this is the pattern that makes distinct-count maintainable
    * at 100 TB — the daily cube is O(types × days × k) longs, each
    * ingest batch updates only its day cell, and ANY rollup grain
    * (type, total, week…) derives from the cube in milliseconds instead
    * of a raw rescan. Hash = first 8 hex digits of md5 (q127's recipe)
    * so the DuckDB twin reproduces it exactly. */
  def q224SketchRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def hv(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    val cube = Tables.events(spark, sfDir)
      .select($"event_type", to_date($"ts").as("d"), hv($"user_id").as("hv"))
      .groupBy($"event_type", $"d")
      .agg(graft.functions.KmvAggregate.kmvMinima($"hv", Q224K).as("mins"))
    val cells = cube.select($"event_type", explode($"mins").as("hv"))
    val perType = cells.groupBy($"event_type")
      .agg(graft.functions.KmvAggregate.kmvDistinct($"hv", Q224K)
        .as("est_merged"))
    val total = cells.groupBy(lit("__all__").as("event_type"))
      .agg(graft.functions.KmvAggregate.kmvDistinct($"hv", Q224K)
        .as("est_merged"))
    val raw = Tables.events(spark, sfDir)
      .select($"event_type", hv($"user_id").as("hv"))
    val directType = raw.groupBy($"event_type")
      .agg(graft.functions.KmvAggregate.kmvDistinct($"hv", Q224K)
        .as("est_direct"))
    val directTotal = raw.groupBy(lit("__all__").as("event_type"))
      .agg(graft.functions.KmvAggregate.kmvDistinct($"hv", Q224K)
        .as("est_direct"))
    perType.unionByName(total)
      .join(directType.unionByName(directTotal), "event_type")
      .orderBy($"event_type")
  }

  def q224Sql: String =
    s"""WITH h AS (
          SELECT DISTINCT event_type,
            list_reduce(list_transform(range(1, 9), i ->
              strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR)), CAST(i AS INT), 1)) - 1),
              (a, b) -> a * 16 + b) AS hv
          FROM events),
        grains AS (
          SELECT event_type, hv FROM h
          UNION ALL SELECT '__all__' AS event_type, hv FROM
            (SELECT DISTINCT hv FROM h)),
        kth AS (
          SELECT event_type, hv FROM (
            SELECT event_type, hv,
              row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
            FROM grains)
          WHERE rn = $Q224K),
        cnt AS (SELECT event_type, count(*) AS nh FROM grains GROUP BY 1)
        SELECT cnt.event_type,
          CAST(COALESCE((${Q224K - 1} * 4294967296) // kth.hv, cnt.nh)
            AS BIGINT) AS est_merged,
          CAST(COALESCE((${Q224K - 1} * 4294967296) // kth.hv, cnt.nh)
            AS BIGINT) AS est_direct
        FROM cnt LEFT JOIN kth USING (event_type)
        ORDER BY event_type"""

  /** Bitmap capacity for q236 — user ids are dense from 0 (fixture
    * contract); 16384 bits = 256 words = 2 KiB per group covers every
    * shipped SF with an order of magnitude of headroom, and overflow
    * fails loudly by the aggregate's contract. */
  private val BitmapCapacity = 16384

  /** q236 — EXACT set-operation cardinalities via presence bitmaps:
    * |purchase users|, |error users|, their intersection, union, and
    * Jaccard — the EXACT twin of q150's KMV-estimated versions of the
    * same quantities. One pass builds a 2 KiB bitmap per event type
    * (update = set bit, merge = word OR — order-free, map-side
    * combining); the set algebra then runs on the aggregated words
    * with NO second scan of events, which is the production reason
    * bitmaps beat count(DISTINCT)-per-combination: k set expressions
    * would otherwise each cost a distinct-shuffle over the corpus.
    * Third member of the custom-aggregate tier (Aggregator = TopK,
    * TypedImperativeAggregate sketch = KMV, exact bitmap = this). */
  def q236BitmapSetops(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.BitmapAggregate._
    val bm = Tables.events(spark, sfDir)
      .filter($"event_type".isin("purchase", "error"))
      .groupBy($"event_type")
      .agg(bitmapBits($"user_id", BitmapCapacity).as("bm"))
    val p = bm.filter($"event_type" === "purchase").select($"bm".as("pbm"))
    val e = bm.filter($"event_type" === "error").select($"bm".as("ebm"))
    p.crossJoin(broadcast(e))
      .select(
        popCount($"pbm").as("n_purchase"),
        popCount($"ebm").as("n_error"),
        popCountAnd($"pbm", $"ebm").as("n_both"),
        popCountOr($"pbm", $"ebm").as("n_either"))
      .select($"n_purchase", $"n_error", $"n_both", $"n_either",
        round($"n_both".cast("double") / $"n_either".cast("double"), 6)
          .as("jaccard"))
  }

  /** The bitmap is exact, so the oracle is plain distinct-set algebra. */
  def q236Sql: String =
    """WITH pu AS (
         SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
       er AS (
         SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
       b AS (SELECT count(*) AS n_both FROM
               (SELECT user_id FROM pu INTERSECT SELECT user_id FROM er)),
       u AS (SELECT count(*) AS n_either FROM
               (SELECT user_id FROM pu UNION SELECT user_id FROM er))
       SELECT
         CAST((SELECT count(*) FROM pu) AS BIGINT) AS n_purchase,
         CAST((SELECT count(*) FROM er) AS BIGINT) AS n_error,
         CAST(b.n_both AS BIGINT) AS n_both,
         CAST(u.n_either AS BIGINT) AS n_either,
         round(CAST(b.n_both AS DOUBLE) / CAST(u.n_either AS DOUBLE), 6)
           AS jaccard
       FROM b CROSS JOIN u"""
}
