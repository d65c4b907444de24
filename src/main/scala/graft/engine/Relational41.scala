package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-ninth query wave: storage-layer and placement operators —
  * chunk-level binary dedup (what a content-addressed blob store
  * saves), rendezvous-vs-modulo rebalancing (why consistent hashing
  * exists, measured exactly), and a seeded Lloyd k-means iteration
  * pair (the canonical MapReduce clustering step, exact-integer with
  * recomputed centers and a provably non-increasing inertia).
  */
object Relational41 {

  /** q318 — CHUNK-LEVEL CONTENT DEDUP: payload text split into fixed
    * 64-char chunks, each chunk content-hashed; byte mass whose chunk
    * hash repeats anywhere in the source is dedup-able. Reports per
    * source the stored-bytes vs unique-chunk-bytes savings — the
    * content-addressed-store audit, complementary to token-level dedup
    * (q19/q21): near-identical payloads share almost all chunks even
    * when token sets differ. (Chunks are CHARACTER-framed here because
    * the oracle engine lacks blob slicing; the Spark plan is framing-
    * agnostic — swap substr for a binary slice on real blobs.)
    *
    * Scale: chunk fan-out is ⌈chars/64⌉ rows of (hash, byte-len) —
    * payloads never shuffle, only 32-char hashes; the unique rollup
    * is hash-keyed. */
  def q318ChunkDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val Chunk = 64
    val chunks = Tables.documents(spark, sfDir)
      .select($"source", $"text", length($"text").as("tlen"))
      .select($"source", posexplode(expr(
        s"transform(sequence(0, (tlen - 1) div $Chunk), " +
          s"i -> substr(text, i * $Chunk + 1, $Chunk))")).as(Seq("i", "c")))
      .select($"source", md5($"c").as("h"), octet_length($"c").as("clen"))
    val perSource = chunks.groupBy($"source")
      .agg(count(lit(1)).as("n_chunks"), sum($"clen").cast("long").as("n_bytes"))
    val uniq = chunks.groupBy($"source", $"h")
      .agg(min($"clen").as("clen"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_unique_chunks"),
        sum($"clen").cast("long").as("unique_bytes"))
    perSource.join(uniq, Seq("source"))
      .withColumn("savings_permille",
        expr("(1000 * (n_bytes - unique_bytes)) div n_bytes"))
      .orderBy($"source")
  }

  def q318Sql: String =
    """WITH chunks AS (
         SELECT source,
           md5(substring(text, i * 64 + 1, 64)) AS h,
           strlen(substring(text, i * 64 + 1, 64)) AS clen
         FROM (SELECT source, text,
                 unnest(range(0, ((length(text) - 1) // 64) + 1)) AS i
               FROM documents)),
       per_source AS (
         SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(clen) AS BIGINT) AS n_bytes
         FROM chunks GROUP BY 1),
       uniq AS (
         SELECT source, CAST(count(*) AS BIGINT) AS n_unique_chunks,
           CAST(sum(clen) AS BIGINT) AS unique_bytes
         FROM (SELECT source, h, min(clen) AS clen
               FROM chunks GROUP BY 1, 2)
         GROUP BY 1)
       SELECT source, n_chunks, n_bytes, n_unique_chunks, unique_bytes,
         (1000 * (n_bytes - unique_bytes)) // n_bytes AS savings_permille
       FROM per_source JOIN uniq USING (source) ORDER BY source"""

  /** q319 — REBALANCING MOVEMENT AUDIT: when the shard count grows
    * 16 → 17, what fraction of documents move under (a) modulo
    * placement h % N vs (b) rendezvous (highest-random-weight)
    * placement argmax_s md5(doc:s)? Exact answer from first
    * principles: modulo moves ~ 15/16 of all docs, rendezvous ~ 1/17
    * — the measured numbers ARE the consistent-hashing argument.
    *
    * Scale: rendezvous fans each doc ×17 cheap hash rows (a
    * projection + per-doc argmax over a broadcast-free sequence);
    * nothing but (doc, shard) pairs ever exists. */
  def q319Rebalance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id")
    val mod = docs.select(
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) " +
        "AS BIGINT) % 16").as("s16"),
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) " +
        "AS BIGINT) % 17").as("s17"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"s16" =!= $"s17", 1L).otherwise(0L)).as("moved"))
      .select(lit("modulo").as("scheme"), $"n_docs", $"moved")
    def hrw(n: Int): DataFrame = {
      val w = Window.partitionBy($"doc_id")
        .orderBy($"wgt".desc, $"shard")
      docs.select($"doc_id", explode(sequence(lit(0), lit(n - 1))).as("shard"))
        .withColumn("wgt",
          md5(concat($"doc_id".cast("string"), lit(":"), $"shard".cast("string"))))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"shard".as(s"hrw$n"))
    }
    val rv = hrw(16).join(hrw(17), Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"hrw16" =!= $"hrw17", 1L).otherwise(0L)).as("moved"))
      .select(lit("rendezvous").as("scheme"), $"n_docs", $"moved")
    mod.unionByName(rv)
      .withColumn("moved_permille", expr("(1000 * moved) div n_docs"))
      .orderBy($"scheme")
  }

  def q319Sql: String = {
    def hrw(n: Int, alias: String) =
      s"""$alias AS (
           SELECT doc_id, shard FROM (
             SELECT doc_id, shard,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' ||
                   CAST(shard AS VARCHAR)) DESC, shard) AS rn
             FROM (SELECT doc_id, unnest(range(0, $n)) AS shard
                   FROM documents))
           WHERE rn = 1)"""
    s"""WITH m AS (
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 16 <>
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) % 17 THEN 1 ELSE 0 END) AS BIGINT) AS moved
         FROM documents),
       ${hrw(16, "h16")}, ${hrw(17, "h17")},
       r AS (
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN h16.shard <> h17.shard THEN 1 ELSE 0 END)
             AS BIGINT) AS moved
         FROM h16 JOIN h17 USING (doc_id)),
       u AS (
         SELECT 'modulo' AS scheme, n_docs, moved FROM m
         UNION ALL
         SELECT 'rendezvous' AS scheme, n_docs, moved FROM r)
       SELECT scheme, n_docs, moved,
         (1000 * moved) // n_docs AS moved_permille
       FROM u ORDER BY scheme"""
  }

  /** q320 — SEEDED LLOYD k-MEANS, TWO EXACT ITERATIONS: 8 centers
    * seeded as the vectors with the smallest md5(vec_id) (deterministic
    * and id-bias-free), embeddings quantized to a 10² integer grid;
    * assignment is integer L2 argmin (ties to the lower cell id),
    * recomputed centers floor to the grid via the offset trick
    * (sums can be negative), and both iterations' per-cell counts and
    * inertia numerators are emitted. Lloyd's monotonicity survives the
    * flooring only approximately — the spec asserts the observed
    * inertia decrease.
    *
    * Scale: per iteration one corpus scan against an 8-row broadcast
    * codebook (crossJoin ×8 then per-vector argmin window — vector-id
    * partitioned, 8 rows per partition); center recompute is a
    * (cell × dim) aggregate. The iteration count is fixed and small —
    * each round is a static plan stage, the q125/q242 discipline. */
  def q320KMeansLloyd(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val K = 8
    val q = Tables.embeddings(spark, sfDir)
      .select($"vec_id", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT))")
        .as("qa"))
    val seeds = q
      .withColumn("mk", md5($"vec_id".cast("string")))
      .orderBy($"mk", $"vec_id").limit(K)
      .withColumn("cell", row_number().over(Window.orderBy($"mk", $"vec_id")))
      .select(($"cell" - 1).cast("long").as("cell"), $"qa".as("ca"))
    def assign(centers: DataFrame): DataFrame = {
      val w = Window.partitionBy($"vec_id").orderBy($"d2".asc, $"cell".asc)
      q.crossJoin(broadcast(centers))
        .withColumn("d2", expr(
          "aggregate(zip_with(qa, ca, (a, b) -> (a - b) * (a - b)), " +
            "0L, (s, x) -> s + x)"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"vec_id", $"qa", $"cell", $"d2")
    }
    def recompute(assigned: DataFrame): DataFrame =
      assigned
        .select($"cell", posexplode($"qa").as(Seq("dim", "v")))
        .groupBy($"cell", $"dim")
        .agg(sum($"v").as("s"), count(lit(1)).as("n"))
        // exact floor(s/n) for possibly-negative s: |q| <= 50 per dim
        .withColumn("c", expr("((s + 50 * n) div n) - 50"))
        .groupBy($"cell")
        .agg(expr("transform(array_sort(collect_list(struct(dim, c))), " +
          "t -> t.c)").as("ca"))
    val a1 = assign(seeds).localCheckpoint()
    val a2 = assign(recompute(a1))
    val s1 = a1.groupBy($"cell")
      .agg(count(lit(1)).as("n_iter1"), sum($"d2").as("inertia1"))
    val s2 = a2.groupBy($"cell")
      .agg(count(lit(1)).as("n_iter2"), sum($"d2").as("inertia2"))
    s1.join(s2, Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n_iter1", "inertia1", "n_iter2", "inertia2"))
      .orderBy($"cell")
  }

  def q320Sql: String =
    """WITH q AS (
         SELECT vec_id,
           list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT)) AS qa
         FROM embeddings),
       seeds AS (
         SELECT CAST(row_number() OVER (
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT)
           AS cell, qa AS ca
         FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
       a1 AS (
         SELECT vec_id, qa, cell, d2 FROM (
           SELECT q.vec_id, q.qa, s.cell,
             CAST(list_sum(list_transform(range(1, 65),
               i -> (q.qa[i] - s.ca[i]) * (q.qa[i] - s.ca[i]))) AS BIGINT)
               AS d2,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_sum(list_transform(range(1, 65),
                 i -> (q.qa[i] - s.ca[i]) * (q.qa[i] - s.ca[i]))) ASC,
                 s.cell ASC) AS rn
           FROM q CROSS JOIN seeds s)
         WHERE rn = 1),
       c2 AS (
         SELECT cell, list(c ORDER BY dim) AS ca
         FROM (
           SELECT cell, dim, ((s + 50 * n) // n) - 50 AS c
           FROM (
             SELECT a1.cell, i - 1 AS dim,
               CAST(sum(a1.qa[i]) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
             FROM a1, unnest(range(1, 65)) AS t(i)
             GROUP BY 1, 2))
         GROUP BY cell),
       a2 AS (
         SELECT vec_id, cell, d2 FROM (
           SELECT q.vec_id, c2.cell,
             CAST(list_sum(list_transform(range(1, 65),
               i -> (q.qa[i] - c2.ca[i]) * (q.qa[i] - c2.ca[i]))) AS BIGINT)
               AS d2,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_sum(list_transform(range(1, 65),
                 i -> (q.qa[i] - c2.ca[i]) * (q.qa[i] - c2.ca[i]))) ASC,
                 c2.cell ASC) AS rn
           FROM q CROSS JOIN c2)
         WHERE rn = 1),
       s1 AS (
         SELECT cell, CAST(count(*) AS BIGINT) AS n_iter1,
           CAST(sum(d2) AS BIGINT) AS inertia1
         FROM a1 GROUP BY 1),
       s2 AS (
         SELECT cell, CAST(count(*) AS BIGINT) AS n_iter2,
           CAST(sum(d2) AS BIGINT) AS inertia2
         FROM a2 GROUP BY 1)
       SELECT coalesce(s1.cell, s2.cell) AS cell,
         coalesce(n_iter1, 0) AS n_iter1, coalesce(inertia1, 0) AS inertia1,
         coalesce(n_iter2, 0) AS n_iter2, coalesce(inertia2, 0) AS inertia2
       FROM s1 FULL OUTER JOIN s2 USING (cell) ORDER BY cell"""
}
