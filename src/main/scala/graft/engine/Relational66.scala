package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighty-fifth query wave: q388 maximal-marginal-relevance selection
  * over the embedding corpus (the diversity-aware retrieval loop a
  * RAG context builder runs), and q389 code-switching census (chunk-
  * level language-ID disagreement inside single documents).
  */
object Relational66 {

  /** q388 selection depth and the relevance/diversity trade-off. */
  val Q388K = 8
  private val Lam = 0.7
  private val OneMinusLam = 0.3

  private def cos(a: Column, b: Column): Column = {
    val d = graft.functions.VectorExpressions.dot_product(a, b)
    val na = graft.functions.VectorExpressions.dot_product(a, a)
    val nb = graft.functions.VectorExpressions.dot_product(b, b)
    d / sqrt(na * nb)
  }

  /** q388 — MAXIMAL MARGINAL RELEVANCE: pick [[Q388K]] vectors for
    * the query (the corpus-min vec_id), greedily maximizing
    * λ·rel(v) − (1−λ)·max_{s∈selected} sim(v, s) — relevance
    * penalized by similarity to what is already chosen, the standard
    * diversity-aware context/retrieval selection. Round 1 is the pure
    * argmax of relevance; each later round re-scores against the
    * single new selection only (`greatest` running max — the q230
    * farthest-point discipline, flipped from coverage to diversity).
    * Cosines use the order-fixed codegen dot product, so Spark and
    * the oracle see bit-identical doubles.
    *
    * Scale: K scans of the corpus, each carrying ONE broadcast
    * vector; the driver sees one argmax row per round;
    * localCheckpoint cuts the loop lineage. The corpus never
    * shuffles. */
  def q388MmrSelect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val qid = emb.agg(min($"vec_id")).head().getLong(0)
    def centerEmb(id: Long) = broadcast(
      emb.filter($"vec_id" === id).select($"embedding".as("c_emb")))
    val base = emb.filter($"vec_id" =!= qid)
      .crossJoin(centerEmb(qid))
      .select($"vec_id", $"embedding",
        cos($"embedding", $"c_emb").as("rel"))
      .transform(Loops.cut)
    val first = base
      .agg(max(struct($"rel", (-$"vec_id").as("nv"))).as("m"))
      .select($"m.rel", $"m.nv").head()
    val (rel1, id1) = (first.getDouble(0), -first.getLong(1))
    var selected = Vector((1L, id1, rel1, 0.0))
    var pool = base.filter($"vec_id" =!= id1)
      .crossJoin(centerEmb(id1))
      .select($"vec_id", $"embedding", $"rel",
        cos($"embedding", $"c_emb").as("ms"))
      .transform(Loops.cut)
    for (i <- 2 to Q388K) {
      val pick = pool
        .agg(max(struct((lit(Lam) * $"rel" - lit(OneMinusLam) * $"ms")
          .as("score"), (-$"vec_id").as("nv"), $"rel", $"ms")).as("m"))
        .select($"m.nv", $"m.rel", $"m.ms").head()
      val (fid, frel, fms) = (-pick.getLong(0), pick.getDouble(1),
        pick.getDouble(2))
      selected :+= ((i.toLong, fid, frel, fms))
      pool = pool.filter($"vec_id" =!= fid)
        .crossJoin(centerEmb(fid))
        .select($"vec_id", $"embedding", $"rel",
          greatest($"ms", cos($"embedding", $"c_emb")).as("ms"))
        .transform(Loops.cut)
    }
    selected.toDF("sel_order", "vec_id", "rel", "ms")
      .select($"sel_order", $"vec_id", round($"rel", 6).as("rel"),
        round($"ms", 6).as("max_sim"))
      .orderBy($"sel_order")
  }

  def q388Sql: String = {
    import Similarity.dotSql
    // Precomputed squared norms + MATERIALIZED rounds: the d_i chain
    // references each d_{i-1} twice (argmax + rescore), so without
    // materialization DuckDB's CTE inlining re-expands the chain
    // ~2^K times — the oracle must stay linear like the Spark loop.
    def cosN(a: String, b: String, na: String, nb: String): String =
      s"(${dotSql(a, b)} / sqrt($na * $nb))"
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (SELECT vec_id, embedding,
               ${dotSql("embedding", "embedding")} AS nrm
             FROM embeddings),
        qv AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qn FROM e
               WHERE vec_id = (SELECT min(vec_id) FROM e)),
        base AS MATERIALIZED (
          SELECT e.vec_id, e.embedding, e.nrm,
            ${cosN("e.embedding", "qv.qe", "e.nrm", "qv.qn")} AS rel
          FROM e CROSS JOIN qv WHERE e.vec_id <> qv.qid),
        p1 AS (SELECT vec_id, rel FROM base
               ORDER BY rel DESC, vec_id LIMIT 1),
        c1 AS (SELECT b.vec_id, b.embedding, b.nrm, b.rel
               FROM base b JOIN p1 USING (vec_id)),
        d1 AS MATERIALIZED (
          SELECT b.vec_id, b.embedding, b.nrm, b.rel,
            ${cosN("b.embedding", "c1.embedding", "b.nrm", "c1.nrm")}
              AS ms
          FROM base b CROSS JOIN c1 WHERE b.vec_id <> c1.vec_id)"""
    for (i <- 2 to Q388K) {
      sb ++= s""",
        p$i AS MATERIALIZED (SELECT vec_id FROM d${i - 1}
                ORDER BY $Lam * rel - $OneMinusLam * ms DESC, vec_id
                LIMIT 1),
        c$i AS MATERIALIZED (SELECT d.vec_id, d.embedding, d.nrm, d.rel, d.ms
                FROM d${i - 1} d JOIN p$i USING (vec_id))"""
      if (i < Q388K) sb ++= s""",
        d$i AS MATERIALIZED (
          SELECT d.vec_id, d.embedding, d.nrm, d.rel,
            greatest(d.ms,
              ${cosN("d.embedding", s"c$i.embedding", "d.nrm",
                s"c$i.nrm")}) AS ms
          FROM d${i - 1} d CROSS JOIN c$i
          WHERE d.vec_id <> c$i.vec_id)"""
    }
    sb ++= s"""
        SELECT CAST(1 AS BIGINT) AS sel_order, vec_id,
          round(rel, 6) AS rel, 0.0 AS max_sim FROM c1"""
    for (i <- 2 to Q388K) sb ++= s"""
        UNION ALL SELECT CAST($i AS BIGINT), vec_id, round(rel, 6),
          round(ms, 6) FROM c$i"""
    sb ++= "\n        ORDER BY sel_order"
    sb.toString
  }

  /** q389 — CODE-SWITCHING CENSUS: split every document's token
    * stream in half, language-ID each half independently, and census
    * documents by (first-half language, second-half language). Docs
    * off the diagonal code-switch at the midpoint granularity — the
    * contamination mode a whole-document language filter (q17)
    * cannot see, and exactly what a monolingual-corpus curator
    * quarantines for re-segmentation.
    *
    * Scale: one tokenize+rebuild projection per doc (map-side, no
    * shuffle until the |langs|² census); the halves are rebuilt with
    * single spaces in BOTH engines, so the heuristic sees identical
    * strings. */
  def q389CodeSwitching(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFunctions
    val halves = Tables.documents(spark, sfDir)
      .select($"doc_id", TextFunctions.tokens($"text").as("t"))
      .select($"doc_id",
        expr("array_join(slice(t, 1, size(t) div 2), ' ')").as("h1"),
        expr("array_join(slice(t, size(t) div 2 + 1, " +
          "size(t) - size(t) div 2), ' ')").as("h2"))
    halves.select(TextFunctions.langId($"h1").as("lang_first"),
        TextFunctions.langId($"h2").as("lang_second"))
      .groupBy($"lang_first", $"lang_second")
      .agg(count(lit(1)).as("n_docs"))
      .select($"lang_first", $"lang_second", $"n_docs",
        ($"lang_first" =!= $"lang_second").cast("long").as("switched"))
      .orderBy($"lang_first", $"lang_second")
  }

  def q389Sql: String = {
    import graft.functions.TextFunctions.langIdSql
    s"""WITH toks AS (
         SELECT doc_id,
           regexp_split_to_array(trim(text), '\\s+') AS t
         FROM documents),
       halves AS (
         SELECT doc_id,
           array_to_string(list_slice(t, 1, len(t) // 2), ' ') AS h1,
           array_to_string(list_slice(t, len(t) // 2 + 1, len(t)), ' ')
             AS h2
         FROM toks),
       ided AS (
         SELECT ${langIdSql("h1")} AS lang_first,
           ${langIdSql("h2")} AS lang_second
         FROM halves)
       SELECT lang_first, lang_second,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(CASE WHEN lang_first <> lang_second THEN 1 ELSE 0 END
           AS BIGINT) AS switched
       FROM ided GROUP BY 1, 2 ORDER BY lang_first, lang_second"""
  }
}
