package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-seventh query wave — lakehouse governance mechanics: GDPR
  * deletion cascading across the foreign-key graph (q259) and
  * deletion-vector economics vs copy-on-write file rewrites (q260).
  * (q258, the streaming hysteresis alerter, lives in
  * [[graft.streaming.Streaming]].)
  */
object Relational29 {

  /** q259 — RIGHT-TO-BE-FORGOTTEN CASCADE: a deletion-request set
    * (every 97th customer) propagated through the FK graph
    * customer → orders → lineitem, reporting per table the before /
    * deleted / after row counts and — the audit's point — that ZERO
    * dangling references survive: after the cascade no order names a
    * deleted customer and no lineitem names a deleted order. This is
    * the compliance job every user-data warehouse schedules; getting
    * the cascade ORDER wrong (children before parents discovered)
    * strands orphans, which is exactly what the orphan columns would
    * expose.
    *
    * Shape: the request set is tiny and rides broadcasts down the
    * first hop; the derived order-key delete set drives a semi join
    * into lineitem (broadcast here; at 100 TB a shuffle semi join or a
    * bloom-filter pushdown, q91's machinery — the CASCADE shape is
    * unchanged). Each table contributes one combinable aggregate;
    * output is |tables| rows. */
  def q259GdprCascade(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val delCust = cust.filter($"c_custkey" % 97 === 0)
      .select($"c_custkey".as("dk"))
    val delOrd = ord.join(broadcast(delCust), $"o_custkey" === $"dk")
      .select($"o_orderkey".as("dok"))
    def audit(name: String, df: DataFrame, delFlag: org.apache.spark.sql.Column,
        orphanFlag: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).as("n_before"),
        sum(when(delFlag, 1L).otherwise(0L)).as("n_deleted"),
        sum(when(!delFlag && orphanFlag, 1L).otherwise(0L))
          .as("orphans_after"))
        .select(lit(name).as("table_name"), $"n_before",
          $"n_deleted", ($"n_before" - $"n_deleted").as("n_after"),
          $"orphans_after")
    // deletion membership via left joins against the (broadcast) delete
    // sets; orphan = surviving row still referencing a deleted parent
    val custA = audit("1_customer",
      cust.join(broadcast(delCust), $"c_custkey" === $"dk", "left"),
      $"dk".isNotNull, lit(false))
    val ordA = audit("2_orders",
      ord.join(broadcast(delCust), $"o_custkey" === $"dk", "left"),
      $"dk".isNotNull, $"dk".isNotNull)
    // lineitem's orphan check is deliberately TWO-HOP — recomputed
    // through orders → customer at audit time, independent of how
    // delOrd was derived — so a cascade that dropped the middle hop
    // would surface here as nonzero orphans, not silently pass
    val liA = audit("3_lineitem",
      li.join(broadcast(delOrd), $"l_orderkey" === $"dok", "left")
        .join(ord.select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(broadcast(delCust), $"o_custkey" === $"dk", "left"),
      $"dok".isNotNull, $"dk".isNotNull)
    custA.unionByName(ordA).unionByName(liA).orderBy($"table_name")
  }

  def q259Sql: String =
    """WITH delc AS (SELECT c_custkey AS dk FROM customer WHERE c_custkey % 97 = 0),
       delo AS (SELECT o_orderkey AS dok FROM orders
                JOIN delc ON o_custkey = dk)
       SELECT '1_customer' AS table_name,
         CAST(count(*) AS BIGINT) AS n_before,
         CAST(sum(CASE WHEN dk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_deleted,
         CAST(count(*) - sum(CASE WHEN dk IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_after,
         CAST(0 AS BIGINT) AS orphans_after
       FROM customer LEFT JOIN delc ON c_custkey = dk
       UNION ALL
       SELECT '2_orders', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN dk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) - sum(CASE WHEN dk IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT),
         CAST(sum(CASE WHEN dk IS NULL AND FALSE THEN 1 ELSE 0 END) AS BIGINT)
       FROM orders LEFT JOIN delc ON o_custkey = dk
       UNION ALL
       SELECT '3_lineitem', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN dok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(*) - sum(CASE WHEN dok IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT),
         CAST(sum(CASE WHEN dok IS NULL AND dk IS NOT NULL
           THEN 1 ELSE 0 END) AS BIGINT)
       FROM lineitem
       LEFT JOIN delo ON l_orderkey = dok
       JOIN orders ON l_orderkey = o_orderkey
       LEFT JOIN delc ON o_custkey = dk
       ORDER BY table_name"""

  /** q260 file grain (rows share a file per orderkey band) and the cost
    * model: a fixed 16-byte DV header plus one bit per row in any file
    * that has deletions, vs rewriting each surviving row at ~100 bytes. */
  val DvFileOrders = 100L
  val DvHeaderBytes = 16L
  val DvRowBytes = 100L

  /** q260 — DELETION-VECTOR ECONOMICS: apply a delete predicate
    * (l_quantity ≥ 45, ~11% of rows) to a file-chunked lineitem two
    * ways and price them — the merge-on-read vs copy-on-write decision
    * every lakehouse table service makes. A deletion vector marks dead
    * ROW POSITIONS inside an immutable file (one bit per row + header,
    * only for files actually touched); copy-on-write rewrites every
    * surviving row of touched files. The audit reports both byte
    * costs and the savings, plus the MERGE-ON-READ PROOF: a checksum
    * of the rows reconstructed by anti-joining the (file, position)
    * delete list — the actual DV read path — equals the checksum of a
    * direct predicate scan.
    *
    * Shape: positions are a window partitioned BY FILE (never global);
    * the delete list is |deleted| rows keyed by (file, pos) — the
    * anti join is the only extra fact-scale work and is exactly what a
    * DV-aware reader executes; everything else is one combinable
    * aggregate. */
  def q260DeletionVectors(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byFile = Window.partitionBy($"file_id")
      .orderBy($"l_orderkey", $"l_linenumber")
    val rows = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .withColumn("file_id", expr(s"l_orderkey div $DvFileOrders"))
      .withColumn("pos", row_number().over(byFile).cast("long"))
      .withColumn("dead", $"l_quantity" >= 45)
    val perFile = rows.groupBy($"file_id")
      .agg(count(lit(1)).as("nr"),
        sum(when($"dead", 1L).otherwise(0L)).as("nd"))
      .withColumn("dv_bytes",
        when($"nd" > 0, ($"nr" + 7) / 8 + DvHeaderBytes)
          .otherwise(0L).cast("long"))
      .withColumn("rw_bytes",
        when($"nd" > 0, ($"nr" - $"nd") * DvRowBytes).otherwise(0L))
    val dels = rows.filter($"dead").select($"file_id", $"pos")
    val live = rows.join(dels, Seq("file_id", "pos"), "left_anti")
    val dvChk = live.agg(
      sum($"l_orderkey" * 8 + $"l_linenumber").as("dv_checksum"))
    val directChk = rows.filter(!$"dead").agg(
      sum($"l_orderkey" * 8 + $"l_linenumber").as("direct_checksum"))
    perFile.agg(
      count(lit(1)).as("n_files"),
      sum(when($"nd" > 0, 1L).otherwise(0L)).as("files_touched"),
      sum($"nr").as("n_rows"), sum($"nd").as("n_deleted"),
      sum($"dv_bytes").as("dv_total_bytes"),
      sum($"rw_bytes").as("rewrite_total_bytes"))
      .withColumn("savings_ppm",
        expr("(rewrite_total_bytes - dv_total_bytes) * 1000000" +
          " div rewrite_total_bytes"))
      .crossJoin(broadcast(dvChk))
      .crossJoin(broadcast(directChk))
  }

  def q260Sql: String =
    s"""WITH rows_t AS (
          SELECT l_orderkey, l_linenumber, l_quantity,
            l_orderkey // $DvFileOrders AS file_id,
            CAST(row_number() OVER (PARTITION BY l_orderkey // $DvFileOrders
              ORDER BY l_orderkey, l_linenumber) AS BIGINT) AS pos,
            l_quantity >= 45 AS dead
          FROM lineitem),
        per_file AS (
          SELECT file_id, CAST(count(*) AS BIGINT) AS nr,
            CAST(sum(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT) AS nd
          FROM rows_t GROUP BY 1),
        costs AS (
          SELECT CAST(count(*) AS BIGINT) AS n_files,
            CAST(sum(CASE WHEN nd > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS files_touched,
            CAST(sum(nr) AS BIGINT) AS n_rows,
            CAST(sum(nd) AS BIGINT) AS n_deleted,
            CAST(sum(CASE WHEN nd > 0
              THEN (nr + 7) // 8 + $DvHeaderBytes ELSE 0 END) AS BIGINT)
              AS dv_total_bytes,
            CAST(sum(CASE WHEN nd > 0 THEN (nr - nd) * $DvRowBytes
              ELSE 0 END) AS BIGINT) AS rewrite_total_bytes
          FROM per_file),
        dels AS (SELECT file_id, pos FROM rows_t WHERE dead),
        dvr AS (
          SELECT CAST(sum(l_orderkey * 8 + l_linenumber) AS BIGINT)
            AS dv_checksum
          FROM rows_t r WHERE NOT EXISTS (
            SELECT 1 FROM dels d
            WHERE d.file_id = r.file_id AND d.pos = r.pos)),
        dir AS (
          SELECT CAST(sum(l_orderkey * 8 + l_linenumber) AS BIGINT)
            AS direct_checksum
          FROM rows_t WHERE NOT dead)
        SELECT n_files, files_touched, n_rows, n_deleted, dv_total_bytes,
          rewrite_total_bytes,
          (rewrite_total_bytes - dv_total_bytes) * 1000000
            // rewrite_total_bytes AS savings_ppm,
          dv_checksum, direct_checksum
        FROM costs, dvr, dir"""
}
