package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-ninth query wave (round 9 close-out): dataset version
  * reconciliation (q292) and tie-preserving grouped top-k (q293). */
object Relational34 {

  /** q292 — DATASET VERSION DIFF: classify every document across two
    * corpus versions as added / removed / changed / unchanged by
    * content hash — the anti-entropy reconciliation a data registry
    * runs between snapshots (and the audit trail a takedown or
    * re-crawl leaves behind). Version 2 is the corpus as shipped;
    * version 1 is derived deterministically (docs ≡2 mod 17 absent —
    * "not yet crawled"; docs ≡5 mod 13 carry older text — simulated by
    * hashing a prefix). The diff is ONE full-outer join on doc_id
    * comparing md5 — no text ever shuffles, only (id, hash) — rolled
    * up per source and change class.
    *
    * Scale: (id, hash) projections are a few dozen bytes per doc
    * regardless of document size; the join shuffles on doc_id; the
    * rollup is |sources|×4 rows. */
  def q292VersionDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val v2 = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", md5($"text").as("h2"))
    val v1 = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 17 =!= 2)
      .select($"doc_id", $"source",
        when($"doc_id" % 13 === 5, md5(substring($"text", 1, 40)))
          .otherwise(md5($"text")).as("h1"))
    v2.join(
        v1.select($"doc_id", $"source".as("source1"), $"h1"),
        Seq("doc_id"), "full_outer")
      // removed docs exist only in v1 — take whichever side has it, so
      // no null source reaches the sort (null ordering differs across
      // engines)
      .select(coalesce($"source", $"source1").as("source"),
        when($"h1".isNull, "added")
          .when($"h2".isNull, "removed")
          .when($"h1" =!= $"h2", "changed")
          .otherwise("unchanged").as("class"))
      .groupBy($"source", $"class")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"source", $"class")
  }

  def q292Sql: String =
    """WITH v2 AS (
         SELECT doc_id, source, md5(text) AS h2 FROM documents),
       v1 AS (
         SELECT doc_id, source,
           CASE WHEN doc_id % 13 = 5 THEN md5(substr(text, 1, 40))
                ELSE md5(text) END AS h1
         FROM documents WHERE doc_id % 17 <> 2),
       d AS (
         SELECT coalesce(v2.source, v1.source) AS source,
           CASE WHEN h1 IS NULL THEN 'added'
                WHEN h2 IS NULL THEN 'removed'
                WHEN h1 <> h2 THEN 'changed'
                ELSE 'unchanged' END AS class
         FROM v2 FULL OUTER JOIN v1 USING (doc_id))
       SELECT source, class, CAST(count(*) AS BIGINT) AS n_docs
       FROM d GROUP BY 1, 2 ORDER BY source, class"""

  /** q293 — TIE-PRESERVING grouped top-k: per return flag, every
    * lineitem whose quantity ranks in the top 3 DISTINCT quantity
    * values — `dense_rank`, so ties all surface (the row_number top-k
    * family truncates ties arbitrarily; a "show me all the maximal
    * rows" report must not). Rank runs per flag (partitioned window);
    * at 100 TB the same query pre-aggregates to distinct (flag,
    * quantity) first — which this does, making the ranked frame
    * |flags|·|quantity domain| and the tie fan-out a join-back.
    *
    * Output is the per-(flag, quantity-rank) tie-class size and
    * revenue mass — row-identical across engines because the rank is
    * over the DISTINCT value frame. */
  def q293TopKTies(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast("long").as("qty"),
        Exact.cents($"l_extendedprice").as("cents"))
    val distinctQty = li.select($"l_returnflag", $"qty").distinct()
      .withColumn("rk", dense_rank().over(
        Window.partitionBy($"l_returnflag").orderBy($"qty".desc)))
      .filter($"rk" <= 3)
    li.join(distinctQty, Seq("l_returnflag", "qty"))
      .groupBy($"l_returnflag", $"rk", $"qty")
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("cents"))
      .orderBy($"l_returnflag", $"rk")
  }

  def q293Sql: String =
    """WITH li AS (
         SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS cents
         FROM lineitem),
       dq AS (
         SELECT l_returnflag, qty,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY qty DESC)
             AS rk
         FROM (SELECT DISTINCT l_returnflag, qty FROM li)),
       top AS (SELECT * FROM dq WHERE rk <= 3)
       SELECT li.l_returnflag, CAST(rk AS BIGINT) AS rk, li.qty,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(cents) AS BIGINT) AS cents
       FROM li JOIN top USING (l_returnflag, qty)
       GROUP BY 1, 2, 3 ORDER BY l_returnflag, rk"""
}
