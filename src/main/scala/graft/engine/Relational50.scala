package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixty-ninth query wave: registry algebra — version-diff COMPOSITION
  * (diff(v1,v3) must equal diff(v1,v2) ∘ diff(v2,v3) — the property
  * that lets a registry ship incremental diffs instead of full
  * snapshots) and the mark-and-sweep GC plan for a content-addressed
  * chunk store (which stored chunks no live document references, and
  * how many bytes deleting them reclaims).
  */
object Relational50 {

  /** q341 — DIFF-COMPOSITION MATRIX: three corpus versions derived
    * by residue rules (v1 misses ≡2 mod 17 with old text for ≡5 mod
    * 13 — q292's construction; v2 = shipped corpus, a superset of
    * both; v3 drops ≡4 mod 19 and rewrites ≡6 mod 11). One three-way
    * full-outer join on doc_id classifies every document under all
    * three diffs at once, and the output is the (c12, c23, c13)
    * transition matrix with counts — the registry-algebra audit: each
    * realized (c12, c23) pair must map to exactly ONE c13 (the wave
    * spec asserts that functional dependency, which is what makes
    * shipping incremental diffs sound; the changed∘changed cell would
    * need a content check, and the matrix SHOWS it never degenerates
    * here because the two rewrites use different hashes).
    *
    * Scale: three (id, hash) projections, one doc_id-keyed 3-way
    * join — hashes only, text never shuffles (q292's posture). */
  def q341DiffCompose(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val v1 = docs.filter($"doc_id" % 17 =!= 2)
      .select($"doc_id",
        when($"doc_id" % 13 === 5, md5(substring($"text", 1, 40)))
          .otherwise(md5($"text")).as("h1"))
    val v2 = docs.select($"doc_id", md5($"text").as("h2"))
    val v3 = docs.filter($"doc_id" % 19 =!= 4)
      .select($"doc_id",
        when($"doc_id" % 11 === 6, md5(concat(lit("v3:"), $"text")))
          .otherwise(md5($"text")).as("h3"))
    def cls(a: Column, b: Column): Column =
      when(a.isNull && b.isNull, "absent")
        .when(a.isNull, "added")
        .when(b.isNull, "removed")
        .when(a =!= b, "changed")
        .otherwise("unchanged")
    v2.join(v1, Seq("doc_id"), "full_outer")
      .join(v3, Seq("doc_id"), "full_outer")
      .select(cls($"h1", $"h2").as("c12"), cls($"h2", $"h3").as("c23"),
        cls($"h1", $"h3").as("c13"))
      .groupBy($"c12", $"c23", $"c13")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"c12", $"c23", $"c13")
  }

  def q341Sql: String =
    """WITH v1 AS (
         SELECT doc_id,
           CASE WHEN doc_id % 13 = 5 THEN md5(substr(text, 1, 40))
                ELSE md5(text) END AS h1
         FROM documents WHERE doc_id % 17 <> 2),
       v2 AS (SELECT doc_id, md5(text) AS h2 FROM documents),
       v3 AS (
         SELECT doc_id,
           CASE WHEN doc_id % 11 = 6 THEN md5('v3:' || text)
                ELSE md5(text) END AS h3
         FROM documents WHERE doc_id % 19 <> 4),
       j AS (
         SELECT h1, h2, h3
         FROM v2 FULL OUTER JOIN v1 USING (doc_id)
              FULL OUTER JOIN v3 USING (doc_id)),
       m AS (
         SELECT
           CASE WHEN h1 IS NULL AND h2 IS NULL THEN 'absent'
                WHEN h1 IS NULL THEN 'added'
                WHEN h2 IS NULL THEN 'removed'
                WHEN h1 <> h2 THEN 'changed' ELSE 'unchanged' END AS c12,
           CASE WHEN h2 IS NULL AND h3 IS NULL THEN 'absent'
                WHEN h2 IS NULL THEN 'added'
                WHEN h3 IS NULL THEN 'removed'
                WHEN h2 <> h3 THEN 'changed' ELSE 'unchanged' END AS c23,
           CASE WHEN h1 IS NULL AND h3 IS NULL THEN 'absent'
                WHEN h1 IS NULL THEN 'added'
                WHEN h3 IS NULL THEN 'removed'
                WHEN h1 <> h3 THEN 'changed' ELSE 'unchanged' END AS c13
         FROM j)
       SELECT c12, c23, c13, CAST(count(*) AS BIGINT) AS n_docs
       FROM m GROUP BY 1, 2, 3 ORDER BY c12, c23, c13"""

  /** q342 — CONTENT-STORE GC PLAN: the blob store holds the 64-char
    * chunk inventory of the CURRENT corpus plus orphans left by
    * deleted docs (≡7 mod 23 — their chunks were never swept).
    * Mark = chunks referenced by live docs; sweep = stored chunks no
    * live doc references. Reports inventory size, live set, orphan
    * count, and reclaimable bytes — mark-and-sweep over hashes only.
    *
    * Scale: two chunk folds + one hash-keyed anti join; chunk BYTES
    * never move, only (hash, len) pairs. */
  def q342GcPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val Chunk = 64
    def chunksOf(df: DataFrame) = df
      .select($"doc_id", $"text", length($"text").as("tlen"))
      .select(posexplode(expr(
        s"transform(sequence(0, (tlen - 1) div $Chunk), " +
          s"i -> substr(text, i * $Chunk + 1, $Chunk))")).as(Seq("i", "c")))
      .select(md5($"c").as("h"), octet_length($"c").as("clen"))
      .groupBy($"h").agg(min($"clen").cast("long").as("clen"))
    val docs = Tables.documents(spark, sfDir)
    val stored = chunksOf(docs) // current + orphaned: union below
    val orphan = chunksOf(docs.filter($"doc_id" % 23 === 7)
      .withColumn("text", concat(lit("old-rev "), $"text")))
    val inventory = stored.unionByName(orphan)
      .groupBy($"h").agg(min($"clen").as("clen"))
    val live = chunksOf(docs.filter($"doc_id" % 23 =!= 7))
    val dead = inventory.join(live.select($"h"), Seq("h"), "left_anti")
    inventory.agg(count(lit(1)).as("stored_chunks"),
        sum($"clen").as("stored_bytes"))
      .crossJoin(broadcast(live.agg(count(lit(1)).as("live_chunks"))))
      .crossJoin(broadcast(dead.agg(count(lit(1)).as("orphan_chunks"),
        coalesce(sum($"clen"), lit(0L)).as("reclaim_bytes"))))
      .select($"stored_chunks", $"stored_bytes", $"live_chunks",
        $"orphan_chunks", $"reclaim_bytes",
        expr("(1000 * reclaim_bytes) div stored_bytes")
          .as("reclaim_permille"))
  }

  def q342Sql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
       cur AS (
         SELECT md5(substring(text, i * 64 + 1, 64)) AS h,
           CAST(min(strlen(substring(text, i * 64 + 1, 64))) AS BIGINT)
             AS clen
         FROM (SELECT doc_id, text,
                 unnest(range(0, ((length(text) - 1) // 64) + 1)) AS i
               FROM base)
         GROUP BY 1),
       orph AS (
         SELECT md5(substring(text, i * 64 + 1, 64)) AS h,
           CAST(min(strlen(substring(text, i * 64 + 1, 64))) AS BIGINT)
             AS clen
         FROM (SELECT doc_id, 'old-rev ' || text AS text,
                 unnest(range(0, ((length('old-rev ' || text) - 1) // 64)
                   + 1)) AS i
               FROM base WHERE doc_id % 23 = 7)
         GROUP BY 1),
       inventory AS (
         SELECT h, CAST(min(clen) AS BIGINT) AS clen FROM (
           SELECT h, clen FROM cur UNION ALL SELECT h, clen FROM orph)
         GROUP BY 1),
       live AS (
         SELECT md5(substring(text, i * 64 + 1, 64)) AS h
         FROM (SELECT doc_id, text,
                 unnest(range(0, ((length(text) - 1) // 64) + 1)) AS i
               FROM base WHERE doc_id % 23 <> 7)
         GROUP BY 1),
       dead AS (
         SELECT inventory.h, clen FROM inventory
         WHERE h NOT IN (SELECT h FROM live))
       SELECT
         (SELECT CAST(count(*) AS BIGINT) FROM inventory) AS stored_chunks,
         (SELECT CAST(sum(clen) AS BIGINT) FROM inventory) AS stored_bytes,
         (SELECT CAST(count(*) AS BIGINT) FROM live) AS live_chunks,
         (SELECT CAST(count(*) AS BIGINT) FROM dead) AS orphan_chunks,
         (SELECT CAST(coalesce(sum(clen), 0) AS BIGINT) FROM dead)
           AS reclaim_bytes,
         (1000 * (SELECT CAST(coalesce(sum(clen), 0) AS BIGINT) FROM dead))
           // (SELECT CAST(sum(clen) AS BIGINT) FROM inventory)
           AS reclaim_permille"""
}
