package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixty-third query wave: replica reconciliation — the Merkle-style
  * ANTI-ENTROPY sweep (shard digests first, doc-level comparison only
  * inside mismatched shards: the two-level narrowing that makes
  * repair O(diff), not O(corpus)) and three-replica QUORUM repair
  * (majority vote per doc, repairs charged to the dissenting
  * replica). Replica divergence is synthesized deterministically from
  * doc_id residues, so both engines see the same "corruption" and the
  * oracle gate stays bit-exact.
  */
object Relational45 {

  private val ShardSz = 64L

  /** q330 — ANTI-ENTROPY NARROWING: replica B lost docs ≡3 (mod 101)
    * and corrupted docs ≡5 (mod 97). Level 1 compares per-shard
    * digests (count + bit_xor of a 60-bit md5-derived doc hash —
    * order-invariant, overflow-free); level 2 touches ONLY docs whose
    * shard digest mismatched, classifying each as missing or
    * corrupt. Output: the narrowing economics (how many shards/docs
    * were touched) plus the exact repair counts.
    *
    * Scale: level 1 is one scan folded to |shards| rows; level 2 is a
    * shard-semi-join (broadcast — the bad-shard list is diff-scale)
    * over the corpus, then doc hashes compare pairwise. Nothing
    * doc-scale crosses the wire for clean shards. */
  def q330AntiEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val a = Tables.documents(spark, sfDir)
      .select($"doc_id", expr("doc_id div " + ShardSz).as("shard"),
        expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
    val b = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 101 =!= 3)
      .select($"doc_id", expr("doc_id div " + ShardSz).as("shard"),
        when($"doc_id" % 97 === 5,
          expr("CAST(conv(substr(md5(substr(text, 1, 10)), 1, 15), 16, 10) AS BIGINT)"))
          .otherwise(
            expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)")).as("h"))
    def digests(r: DataFrame) = r.groupBy($"shard")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
    val bad = digests(a).as("da")
      .join(digests(b).as("db"), Seq("shard"), "full_outer")
      .filter(col("da.n").isNull || col("db.n").isNull ||
        col("da.n") =!= col("db.n") || col("da.x") =!= col("db.x"))
      .select($"shard")
    val aBad = a.join(broadcast(bad), Seq("shard"))
    val bBad = b.join(broadcast(bad), Seq("shard"))
    val repairs = aBad.join(bBad.select($"doc_id", $"h".as("hb")),
        Seq("doc_id"), "left_outer")
      .select(
        when($"hb".isNull, "missing")
          .when($"hb" =!= $"h", "corrupt")
          .otherwise("ok").as("cls"))
      .groupBy().pivot("cls", Seq("missing", "corrupt", "ok")).count()
      .na.fill(0L, Seq("missing", "corrupt", "ok"))
    val scale = digests(a).agg(count(lit(1)).as("n_shards"))
      .crossJoin(broadcast(bad.agg(count(lit(1)).as("bad_shards"))))
      .crossJoin(broadcast(aBad.agg(count(lit(1)).as("docs_touched"))))
      .crossJoin(broadcast(a.agg(count(lit(1)).as("n_docs"))))
    scale.crossJoin(broadcast(repairs))
      .select($"n_docs", $"n_shards", $"bad_shards", $"docs_touched",
        $"missing".as("repairs_missing"), $"corrupt".as("repairs_corrupt"))
  }

  def q330Sql: String =
    s"""WITH a AS (
         SELECT doc_id, doc_id // $ShardSz AS shard,
           CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
         FROM documents),
       b AS (
         SELECT doc_id, doc_id // $ShardSz AS shard,
           CASE WHEN doc_id % 97 = 5
             THEN CAST('0x' || substr(md5(substr(text, 1, 10)), 1, 15)
               AS BIGINT)
             ELSE CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) END AS h
         FROM documents WHERE doc_id % 101 <> 3),
       da AS (SELECT shard, CAST(count(*) AS BIGINT) AS n, bit_xor(h) AS x
              FROM a GROUP BY 1),
       db AS (SELECT shard, CAST(count(*) AS BIGINT) AS n, bit_xor(h) AS x
              FROM b GROUP BY 1),
       bad AS (
         SELECT coalesce(da.shard, db.shard) AS shard
         FROM da FULL OUTER JOIN db USING (shard)
         WHERE da.n IS NULL OR db.n IS NULL OR da.n <> db.n OR da.x <> db.x),
       abad AS (SELECT a.* FROM a JOIN bad USING (shard)),
       bbad AS (SELECT b.* FROM b JOIN bad USING (shard)),
       rep AS (
         SELECT CASE WHEN bbad.h IS NULL THEN 'missing'
                     WHEN bbad.h <> abad.h THEN 'corrupt'
                     ELSE 'ok' END AS cls
         FROM abad LEFT JOIN bbad USING (doc_id)),
       counts AS (
         SELECT
           CAST(coalesce(sum(CASE WHEN cls = 'missing' THEN 1 END), 0)
             AS BIGINT) AS repairs_missing,
           CAST(coalesce(sum(CASE WHEN cls = 'corrupt' THEN 1 END), 0)
             AS BIGINT) AS repairs_corrupt
         FROM rep)
       SELECT
         (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_docs,
         (SELECT CAST(count(*) AS BIGINT) FROM da) AS n_shards,
         (SELECT CAST(count(*) AS BIGINT) FROM bad) AS bad_shards,
         (SELECT CAST(count(*) AS BIGINT) FROM abad) AS docs_touched,
         repairs_missing, repairs_corrupt
       FROM counts"""

  /** q331 — QUORUM REPAIR: three replicas with INDEPENDENT
    * deterministic corruption (A: docs ≡11 mod 83, B: ≡5 mod 97,
    * C: ≡7 mod 89 — each corruption a different content hash). Per
    * doc the majority hash wins; each dissenting replica owes one
    * repair; docs where no two replicas agree are unrecoverable
    * without an authoritative source. One scan, pure projection +
    * fold — the read-repair scorecard.
    *
    * Scale: zero joins; three conditional hash expressions per row
    * and a 1-row aggregate. */
  def q331QuorumRepair(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def rep(mod: Long, res: Long, salt: String) =
      when($"doc_id" % mod === res, md5(concat(lit(salt), $"text")))
        .otherwise(md5($"text"))
    val voted = Tables.documents(spark, sfDir)
      .select($"doc_id",
        rep(83L, 11L, "a:").as("ha"),
        rep(97L, 5L, "b:").as("hb"),
        rep(89L, 7L, "c:").as("hc"))
      .withColumn("maj",
        when($"ha" === $"hb" || $"ha" === $"hc", $"ha")
          .when($"hb" === $"hc", $"hb"))
    voted.agg(
      count(lit(1)).as("n_docs"),
      sum(when($"maj".isNull, 1L).otherwise(0L)).as("unrecoverable"),
      sum(when($"maj".isNotNull && $"ha" =!= $"maj", 1L).otherwise(0L))
        .as("repairs_a"),
      sum(when($"maj".isNotNull && $"hb" =!= $"maj", 1L).otherwise(0L))
        .as("repairs_b"),
      sum(when($"maj".isNotNull && $"hc" =!= $"maj", 1L).otherwise(0L))
        .as("repairs_c"))
  }

  def q331Sql: String =
    """WITH v AS (
         SELECT doc_id,
           CASE WHEN doc_id % 83 = 11 THEN md5('a:' || text)
                ELSE md5(text) END AS ha,
           CASE WHEN doc_id % 97 = 5 THEN md5('b:' || text)
                ELSE md5(text) END AS hb,
           CASE WHEN doc_id % 89 = 7 THEN md5('c:' || text)
                ELSE md5(text) END AS hc
         FROM documents),
       m AS (
         SELECT doc_id, ha, hb, hc,
           CASE WHEN ha = hb OR ha = hc THEN ha
                WHEN hb = hc THEN hb END AS maj
         FROM v)
       SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN maj IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS unrecoverable,
         CAST(sum(CASE WHEN maj IS NOT NULL AND ha <> maj THEN 1 ELSE 0 END)
           AS BIGINT) AS repairs_a,
         CAST(sum(CASE WHEN maj IS NOT NULL AND hb <> maj THEN 1 ELSE 0 END)
           AS BIGINT) AS repairs_b,
         CAST(sum(CASE WHEN maj IS NOT NULL AND hc <> maj THEN 1 ELSE 0 END)
           AS BIGINT) AS repairs_c
       FROM m"""
}
