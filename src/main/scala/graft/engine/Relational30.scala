package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Thirty-eighth query wave and successors — table-service planning
  * and training-run planning: incremental OPTIMIZE (q261),
  * materialized-view routing (q262), priority allocation via prefix
  * sums (q263), and training-order shuffle quality (q269).
  */
object Relational30 {

  /** q261 file count for the base z-layout. The rewrite threshold is
    * RELATIVE — 1.25× the append's mean per-file load ((5·n)/(4·files),
    * floor) — so the rewrite/sidecar split tracks the batch's own skew
    * at every scale factor instead of degenerating once batches outgrow
    * a fixed constant. */
  val OptFiles = 32

  /** q261 — INCREMENTAL OPTIMIZE PLANNING: a z-clustered table absorbs
    * an append batch, and the table service must decide — per existing
    * file — rewrite (merge the newcomers in, preserving clustering),
    * sidecar (few newcomers → a small delta file), or leave untouched.
    * The base is the first 80% of events clustered by q92's z-key into
    * [[OptFiles]] equal files with recorded [zmin, zmax] stats; the
    * append is the remaining 20%, each row ASSIGNED to the file whose
    * z-range claims it (files carve a sorted z-order, so assignment is
    * "count of file lower-bounds ≤ z" — the same order-preserving
    * broadcast-cuts projection DistRank uses, over the 32-element zmin
    * array; no join). The plan report: files per decision, the rows a
    * rewrite pass touches, and write amplification vs the append size
    * — the number that tells you whether incremental beats full
    * re-clustering (q92) for this batch. Shapes: one scan each for
    * base carve (DistRank) and append assignment (broadcast array);
    * file stats are a 32-row aggregate. */
  def q261OptimizePlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dims = Tables.events(spark, sfDir)
      .select($"event_id",
        ($"user_id" % 256).cast("long").as("d1"),
        least(floor($"value" / 2), lit(255)).cast("long").as("d2"))
      .withColumn("z", Relational5.zValue($"d1", $"d2"))
    val cut = dims.agg((max($"event_id") * 8 / 10).cast("long").as("cut"))
    val flagged = dims.crossJoin(broadcast(cut))
      .withColumn("isBase", $"event_id" <= $"cut")
      .localCheckpoint() // base carve + append assignment both walk it
    val base = flagged.filter($"isBase")
    val append = flagged.filter(!$"isBase")
    val nBase = base.count()
    val perFile = (nBase + OptFiles - 1) / OptFiles
    val files = DistRank.withRank(base, "z", "event_id", "rn", desc = false,
        nBuckets = OptFiles)
      .withColumn("file_id", (($"rn" - 1) / perFile).cast("long"))
      .groupBy($"file_id")
      .agg(count(lit(1)).as("n_rows"), min($"z").as("zmin"), max($"z").as("zmax"))
    // 32-element sorted zmin array rides a broadcast; assignment is a
    // projection (count of lower bounds ≤ z), exactly one file per row
    val bounds = files.agg(sort_array(collect_list($"zmin")).as("zmins"))
    val assigned = append.crossJoin(broadcast(bounds))
      .withColumn("file_id",
        expr("aggregate(zmins, -1L, (a, c) -> a + IF(z >= c, 1L, 0L))"))
      .withColumn("file_id", greatest($"file_id", lit(0L)))
      .groupBy($"file_id").agg(count(lit(1)).as("n_new"))
    val total = assigned.agg(sum($"n_new").as("n_append_total"))
    val plan = files.join(assigned, Seq("file_id"), "left")
      .na.fill(0L, Seq("n_new"))
      .crossJoin(broadcast(total))
      .withColumn("thr",
        expr(s"(5 * n_append_total) div (4 * $OptFiles)"))
      .withColumn("decision",
        when($"n_new" >= greatest($"thr", lit(1L)), "rewrite")
          .when($"n_new" > 0, "sidecar")
          .otherwise("untouched"))
    plan.groupBy($"decision")
      .agg(count(lit(1)).as("n_files"),
        sum($"n_new").as("rows_appended"),
        sum(when($"decision" === "rewrite", $"n_rows" + $"n_new")
          .otherwise(0L)).as("rows_rewritten"),
        first($"n_append_total").as("n_append_total"))
      .withColumn("amp_ppm",
        expr("rows_rewritten * 1000000 div n_append_total"))
      .drop("n_append_total")
      .orderBy($"decision")
  }

  def q261Sql: String = {
    val z = Relational5.zValueSql("d1", "d2")
    s"""WITH dims AS (
          SELECT event_id,
            CAST(user_id % 256 AS BIGINT) AS d1,
            CAST(least(floor(value / 2), 255) AS BIGINT) AS d2
          FROM events),
        keyed AS (SELECT event_id, CAST(($z) AS BIGINT) AS z FROM dims),
        c AS (SELECT CAST(max(event_id) * 8 // 10 AS BIGINT) AS cut FROM keyed),
        base AS (SELECT * FROM keyed, c WHERE event_id <= cut),
        app AS (SELECT * FROM keyed, c WHERE event_id > cut),
        sized AS (SELECT CAST(ceil(count(*) / $OptFiles.0) AS BIGINT)
          AS per_file FROM base),
        filed AS (
          SELECT z, (row_number() OVER (ORDER BY z, event_id) - 1)
            // (SELECT per_file FROM sized) AS file_id
          FROM base),
        files AS (
          SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
            min(z) AS zmin, max(z) AS zmax
          FROM filed GROUP BY 1),
        zl AS (SELECT list(zmin ORDER BY zmin) AS zmins FROM files),
        assigned AS (
          SELECT greatest(list_reduce(list_prepend(CAST(-1 AS BIGINT),
              (SELECT zmins FROM zl)),
              (a, cv) -> a + CASE WHEN z >= cv THEN 1 ELSE 0 END), 0)
            AS file_id
          FROM app),
        acnt AS (
          SELECT file_id, CAST(count(*) AS BIGINT) AS n_new
          FROM assigned GROUP BY 1),
        tot AS (SELECT CAST(sum(n_new) AS BIGINT) AS n_append_total FROM acnt),
        plan AS (
          SELECT f.file_id, f.n_rows, coalesce(a.n_new, 0) AS n_new,
            CASE WHEN coalesce(a.n_new, 0) >=
                greatest((5 * (SELECT n_append_total FROM tot))
                  // (4 * $OptFiles), 1) THEN 'rewrite'
                 WHEN coalesce(a.n_new, 0) > 0 THEN 'sidecar'
                 ELSE 'untouched' END AS decision
          FROM files f LEFT JOIN acnt a ON f.file_id = a.file_id)
        SELECT decision, CAST(count(*) AS BIGINT) AS n_files,
          CAST(sum(n_new) AS BIGINT) AS rows_appended,
          CAST(sum(CASE WHEN decision = 'rewrite' THEN n_rows + n_new
            ELSE 0 END) AS BIGINT) AS rows_rewritten,
          CAST(sum(CASE WHEN decision = 'rewrite' THEN n_rows + n_new
            ELSE 0 END) AS BIGINT) * 1000000
            // (SELECT n_append_total FROM tot) AS amp_ppm
        FROM plan GROUP BY decision ORDER BY decision"""
  }

  /** q262 — MATERIALIZED-VIEW ROUTING: the semantic-layer move — serve
    * each incoming aggregate query from the COARSEST materialized
    * rollup whose grouping keys still cover it, and prove the routed
    * answer equals a base-table scan. Three MVs at nested grains
    * (flag×status×month ⊃ flag×status ⊃ flag) are materialized as
    * grouped frames; three query shapes route to the smallest
    * covering MV (flag×month → only MV1 covers; status → MV2 via
    * rollup; flag → MV3 directly). For each, the report carries the
    * MV's row count vs the base row count — the scan-cost ratio that
    * justifies the MV — and twin checksums (measure total via the MV
    * rollup vs via the base) whose equality IS additivity: SUM is
    * rollup-safe, which is exactly why the router may substitute the
    * MV. All grains share one base scan (the MV ladder is three
    * cascaded aggregates); checksums are integer cents. */
  def q262MvRouting(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag".as("flag"), $"l_linestatus".as("status"),
        expr("month(to_date(l_shipdate))").cast("long").as("mth"),
        Exact.cents($"l_quantity").as("qc"))
      .localCheckpoint() // three routed queries + three MV grains share it
    val nBase = base.count()
    val mv1 = base.groupBy($"flag", $"status", $"mth")
      .agg(sum($"qc").as("qc")) // finest rollup
    val mv2 = mv1.groupBy($"flag", $"status").agg(sum($"qc").as("qc"))
    val mv3 = mv2.groupBy($"flag").agg(sum($"qc").as("qc"))
    // mv_rows = the FULL row count of the MV the router reads (its scan
    // cost), not the routed answer's group count
    def route(name: String, mvName: String, mvFrame: DataFrame,
        answerFromMv: DataFrame, baseAnswer: DataFrame): DataFrame = {
      val mvRows = mvFrame.count()
      val mvSum = answerFromMv.agg(sum($"qc").as("mv_checksum"))
      val bSum = baseAnswer.agg(sum($"qc").as("base_checksum"))
      mvSum.crossJoin(broadcast(bSum))
        .select(lit(name).as("query_name"), lit(mvName).as("mv_used"),
          lit(mvRows).as("mv_rows"), lit(nBase).as("base_rows"),
          $"mv_checksum", $"base_checksum")
    }
    // query 1: (flag, mth) — only MV1 retains mth; roll status out
    val q1 = route("1_flag_month", "mv1_flag_status_month", mv1,
      mv1.groupBy($"flag", $"mth").agg(sum($"qc").as("qc")),
      base.groupBy($"flag", $"mth").agg(sum($"qc").as("qc")))
    // query 2: (status) — MV2 suffices; roll flag out
    val q2 = route("2_status", "mv2_flag_status", mv2,
      mv2.groupBy($"status").agg(sum($"qc").as("qc")),
      base.groupBy($"status").agg(sum($"qc").as("qc")))
    // query 3: (flag) — MV3 answers directly
    val q3 = route("3_flag", "mv3_flag", mv3, mv3,
      base.groupBy($"flag").agg(sum($"qc").as("qc")))
    q1.unionByName(q2).unionByName(q3).orderBy($"query_name")
  }

  def q262Sql: String =
    """WITH base AS (
         SELECT l_returnflag AS flag, l_linestatus AS status,
           CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) AS mth,
           CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc
         FROM lineitem),
       nb AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
       mv1 AS (SELECT flag, status, mth, CAST(sum(qc) AS BIGINT) AS qc
               FROM base GROUP BY 1, 2, 3),
       mv2 AS (SELECT flag, status, CAST(sum(qc) AS BIGINT) AS qc
               FROM mv1 GROUP BY 1, 2),
       mv3 AS (SELECT flag, CAST(sum(qc) AS BIGINT) AS qc FROM mv2 GROUP BY 1)
       SELECT '1_flag_month' AS query_name, 'mv1_flag_status_month' AS mv_used,
         (SELECT CAST(count(*) AS BIGINT) FROM mv1) AS mv_rows,
         (SELECT n FROM nb) AS base_rows,
         (SELECT CAST(sum(qc) AS BIGINT) FROM
           (SELECT flag, mth, sum(qc) AS qc FROM mv1 GROUP BY 1, 2))
           AS mv_checksum,
         (SELECT CAST(sum(qc) AS BIGINT) FROM
           (SELECT flag, mth, sum(qc) AS qc FROM base GROUP BY 1, 2))
           AS base_checksum
       UNION ALL
       SELECT '2_status', 'mv2_flag_status',
         (SELECT CAST(count(*) AS BIGINT) FROM mv2), (SELECT n FROM nb),
         (SELECT CAST(sum(qc) AS BIGINT) FROM
           (SELECT status, sum(qc) AS qc FROM mv2 GROUP BY 1)),
         (SELECT CAST(sum(qc) AS BIGINT) FROM
           (SELECT status, sum(qc) AS qc FROM base GROUP BY 1))
       UNION ALL
       SELECT '3_flag', 'mv3_flag',
         (SELECT CAST(count(*) AS BIGINT) FROM mv3), (SELECT n FROM nb),
         (SELECT CAST(sum(qc) AS BIGINT) FROM mv3),
         (SELECT CAST(sum(qc) AS BIGINT) FROM
           (SELECT flag, sum(qc) AS qc FROM base GROUP BY 1))
       ORDER BY query_name"""

  /** q263 — PRIORITY ALLOCATION AS A PREFIX SUM: each part's available
    * stock (60% of its total demand) is handed out to its order lines
    * in strict priority order (orderkey, linenumber) — first-come
    * fully served, the marginal line partially, the tail starved. The
    * greedy loop every allocator/budget-pacer/quota system runs LOOKS
    * inherently sequential, but its closed form is
    * alloc_i = clamp(S − cumsum_before_i, 0, q_i): one exclusive
    * running sum per part (a window PARTITIONED by partkey — per-key
    * frames, never a global funnel, q244's discipline) turns the whole
    * allocation into a projection. Cents grid throughout; the report
    * is the fill ledger per outcome class plus the global fill rate.
    *
    * Scale: one shuffle on partkey (the window), one |classes|-row
    * aggregate. The same shape allocates ad budgets to impressions or
    * rate-limits to tenants at any row count. */
  def q263Allocation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // (l_orderkey, l_linenumber) is NOT unique in this fixture (the
    // q353/q354 finding; q251 paid for it at the ×10 carve), and a tie
    // straddling the 60 % allocation boundary would make the status
    // census order-dependent — the md5 row-hash totalizes the order
    // portably (rows that still tie are identical in qc, and
    // equal-quantity swaps leave every allocation unchanged)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_partkey")
      .orderBy($"l_orderkey", $"l_linenumber", $"rowtie")
    val lines = Tables.lineitem(spark, sfDir)
      .select($"l_partkey", $"l_orderkey", $"l_linenumber",
        Exact.cents($"l_quantity").as("qc"))
      .withColumn("rowtie", expr(
        """CAST(conv(substr(md5(concat_ws('|', l_partkey, l_orderkey,
          |  l_linenumber, qc)), 1, 15), 16, 10) AS BIGINT)""".stripMargin))
      .withColumn("demand", sum($"qc").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"l_partkey")))
      .withColumn("stock", expr("demand * 6 div 10"))
      .withColumn("before", coalesce(sum($"qc").over(
        w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("alloc",
        greatest(lit(0L), least($"qc", $"stock" - $"before")))
      .withColumn("status",
        when($"alloc" === $"qc", "1_filled")
          .when($"alloc" > 0, "2_partial")
          .otherwise("3_starved"))
    lines.groupBy($"status")
      .agg(count(lit(1)).as("n_lines"),
        sum($"qc").as("requested_cents"),
        sum($"alloc").as("allocated_cents"))
      .crossJoin(broadcast(lines.agg(
        expr("sum(alloc) * 1000000 div sum(qc)").as("fill_rate_ppm"))))
      .orderBy($"status")
  }

  def q263Sql: String =
    """WITH lines AS (
         SELECT l_partkey, l_orderkey, l_linenumber,
           CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
           CAST('0x' || substr(md5(concat_ws('|', l_partkey, l_orderkey,
             l_linenumber,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))),
             1, 15) AS BIGINT) AS rowtie
         FROM lineitem),
       alloc AS (
         SELECT qc,
           greatest(0, least(qc,
             (sum(qc) OVER (PARTITION BY l_partkey)) * 6 // 10
               - coalesce(sum(qc) OVER (PARTITION BY l_partkey
                   ORDER BY l_orderkey, l_linenumber, rowtie
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)))
             AS alloc
         FROM lines),
       cls AS (
         SELECT qc, alloc,
           CASE WHEN alloc = qc THEN '1_filled'
                WHEN alloc > 0 THEN '2_partial'
                ELSE '3_starved' END AS status
         FROM alloc),
       fr AS (SELECT CAST(sum(alloc) AS BIGINT) * 1000000
                // CAST(sum(qc) AS BIGINT) AS fill_rate_ppm FROM cls)
       SELECT status, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(qc) AS BIGINT) AS requested_cents,
         CAST(sum(alloc) AS BIGINT) AS allocated_cents,
         (SELECT fill_rate_ppm FROM fr) AS fill_rate_ppm
       FROM cls GROUP BY status ORDER BY status"""

  /** q269 — TRAINING-ORDER SHUFFLE QUALITY: before a corpus feeds SGD,
    * it must be globally shuffled — consecutive same-source documents
    * correlate gradients and measurably hurt training. This audit
    * quantifies the shuffle: under the source-sorted order (worst
    * case) and the md5(doc_id) order (the pipeline's deterministic
    * shuffle, q80's discipline), count same-source ADJACENCIES in the
    * global sequence. Sorted order yields n − |sources|; a good
    * shuffle lands near the multinomial expectation Σ n_s·(n_s−1)/(n−1)
    * — reported alongside so the verdict is a number, not a vibe
    * (rate_ppm vs expected_ppm). Same machinery as q251: DistRank
    * global ranks (never a single-partition window), adjacency via the
    * rn = prev.rn + 1 equi join.
    *
    * The md5 order key uses the first 12 hex digits (48 bits — no
    * collisions in any realistic corpus, and a collision would only
    * make two docs adjacent-order-swapped, which the tie column
    * resolves deterministically anyway). */
  def q269ShuffleQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)")
          .as("hk"),
        // source-sorted composite: dense source index would need a join;
        // hashing the source name to the high bits keeps one numeric key
        expr("CAST(conv(substring(md5(source), 1, 7), 16, 10) AS BIGINT)" +
          " * 4294967296 + doc_id").as("sk"))
      .localCheckpoint()
    val exp = docs.groupBy($"source").agg(count(lit(1)).as("ns"))
      .agg(sum($"ns").as("n"),
        sum($"ns" * ($"ns" - 1)).as("pairSum"))
      .select($"n", expr("pairSum * 1000000 div (n * (n - 1))").as("expected_ppm"))
    def adjacencies(key: String, label: String): DataFrame = {
      val ranked = DistRank.withRank(docs, key, "doc_id", "rn", desc = false)
        .select($"rn", $"source")
      val prev = ranked.select(($"rn" + 1).as("rn"), $"source".as("psrc"))
      ranked.join(prev, "rn")
        .agg(sum(when($"source" === $"psrc", 1L).otherwise(0L)).as("same_adj"),
          count(lit(1)).as("n_adj"))
        .select(lit(label).as("ordering"), $"same_adj", $"n_adj",
          expr("same_adj * 1000000 div n_adj").as("rate_ppm"))
    }
    adjacencies("sk", "1_source_sorted")
      .unionByName(adjacencies("hk", "2_md5_shuffled"))
      .crossJoin(broadcast(exp.select($"expected_ppm")))
      .orderBy($"ordering")
  }

  def q269Sql: String =
    """WITH docs AS (
         SELECT doc_id, source,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
             AS hk,
           CAST(('0x' || substr(md5(source), 1, 7)) AS BIGINT)
             * 4294967296 + doc_id AS sk
         FROM documents),
       e AS (
         SELECT CAST(sum(ns) AS BIGINT) AS n,
           CAST(sum(ns * (ns - 1)) AS BIGINT) AS pairSum
         FROM (SELECT source, count(*) AS ns FROM docs GROUP BY 1)),
       expv AS (SELECT pairSum * 1000000 // (n * (n - 1)) AS expected_ppm FROM e),
       srt AS (
         SELECT source, lag(source) OVER (ORDER BY sk, doc_id) AS psrc
         FROM docs),
       shf AS (
         SELECT source, lag(source) OVER (ORDER BY hk, doc_id) AS psrc
         FROM docs),
       rows_s AS (
         SELECT '1_source_sorted' AS ordering,
           CAST(sum(CASE WHEN source = psrc THEN 1 ELSE 0 END) AS BIGINT)
             AS same_adj,
           CAST(count(*) - 1 AS BIGINT) AS n_adj
         FROM srt
         UNION ALL
         SELECT '2_md5_shuffled',
           CAST(sum(CASE WHEN source = psrc THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) - 1 AS BIGINT)
         FROM shf)
       SELECT ordering, same_adj, n_adj,
         same_adj * 1000000 // n_adj AS rate_ppm,
         (SELECT expected_ppm FROM expv) AS expected_ppm
       FROM rows_s ORDER BY ordering"""
}
