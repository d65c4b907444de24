package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the near-duplicate candidate graph (q21's LSH
  * pairs as undirected edges) — the corpus-quality lens that treats
  * near-dup structure as a graph instead of a pair list: triangle
  * participation separates tight duplicate cliques from chance LSH
  * collisions, and PageRank-style centrality ranks each cluster's most
  * representative member.
  *
  * Both queries keep every number a 64-bit integer end to end (counts,
  * or micro-scaled fixed-point ranks with explicit floor division), so
  * the distributed result is bit-identical to the single-threaded
  * oracle no matter how shuffles order the arithmetic — float PageRank
  * would be order-dependent under partial aggregation.
  *
  * Scale posture: the edge list is the POST-LSH candidate set — orders
  * of magnitude smaller than the corpus — and every step is an
  * edge-keyed join/aggregate (never all-pairs). Triangle counting uses
  * the oriented (a<b<c) enumeration, which counts each triangle once
  * and bounds the join fan-out by the forward-degree of each node.
  */
object GraphQueries {

  /** Edges once, materialized: both queries iterate over the pair list
    * several times, and a lazy plan would re-run the LSH pipeline per
    * consumer (same hazard q119 documents). */
  private def pairsView(spark: SparkSession, sfDir: String, name: String): Unit =
    Dedup.q21MinhashLsh(spark, sfDir).select("doc_a", "doc_b")
      .coalesce(1).localCheckpoint()
      .createOrReplaceTempView(name)

  /** Per-document triangle participation: a triangle (a<b<c) needs all
    * three edges present; each member doc gets credit. Triangles are
    * the signature of true duplicate CLIQUES — a chance LSH collision
    * produces a stray edge, not a closed triple — so triangle counts
    * are the cheap precision audit on the candidate graph before
    * cluster-level dedup commits to dropping documents.
    *
    * Scale: with edges oriented low→high, the b-keyed join extends
    * each wedge only through forward neighbors and the closing edge is
    * an equi-join on (a,c) — one shuffle per hop on the (tiny) edge
    * list, fan-out bounded by forward degree. */
  def q124Triangles(spark: SparkSession, sfDir: String): DataFrame = {
    pairsView(spark, sfDir, "graft_tri_pairs")
    spark.sql(
      """WITH tri AS (
           SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
           FROM graft_tri_pairs e1
           JOIN graft_tri_pairs e2 ON e1.doc_b = e2.doc_a
           JOIN graft_tri_pairs e3
             ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
         members AS (
           SELECT a AS doc FROM tri
           UNION ALL SELECT b FROM tri
           UNION ALL SELECT c FROM tri)
         SELECT doc, count(*) AS n_triangles
         FROM members GROUP BY doc ORDER BY doc""")
  }

  def q124Sql: String =
    s"""WITH ${Dedup.bandCtes},
        tri AS (
          SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
          FROM pairs e1
          JOIN pairs e2 ON e1.doc_b = e2.doc_a
          JOIN pairs e3
            ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        members AS (
          SELECT a AS doc FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        SELECT doc, count(*) AS n_triangles
        FROM members GROUP BY doc ORDER BY doc"""

  /** Two power iterations of PageRank (damping 0.85) in micro-scaled
    * FIXED-POINT integer arithmetic: ranks live on a 10^6 grid,
    * damping is the exact rational 17/20, and every neighbor
    * contribution is an explicit floor division — so partial-aggregate
    * order cannot perturb a single bit, unlike float PageRank where
    * the per-node sum is order-dependent under shuffle. Fixed
    * iteration count (not convergence) keeps the query one static
    * plan: iter-k ranks join the edge list, floor-divide by the
    * sender's degree, and re-aggregate per receiver.
    *
    * Scale: each iteration is one shuffle of the edge list keyed by
    * receiver plus a broadcast-size degree table; at 100 TB the same
    * two-join template runs per iteration with the rank frame
    * checkpointed between rounds (q67's loop discipline). */
  def q125PagerankExact(spark: SparkSession, sfDir: String): DataFrame = {
    pairsView(spark, sfDir, "graft_pr_pairs")
    spark.sql(
      """WITH edges AS (
           SELECT doc_a AS src, doc_b AS dst FROM graft_pr_pairs
           UNION ALL
           SELECT doc_b, doc_a FROM graft_pr_pairs),
         deg AS (SELECT src AS doc, count(*) AS d FROM edges GROUP BY src),
         pr1 AS (
           SELECT e.dst AS doc,
             150000 + sum((1000000 * 17 div 20) div dg.d) AS r
           FROM edges e JOIN deg dg ON e.src = dg.doc
           GROUP BY e.dst),
         pr2 AS (
           SELECT e.dst AS doc,
             150000 + sum((pr1.r * 17 div 20) div dg.d) AS r
           FROM edges e
           JOIN deg dg ON e.src = dg.doc
           JOIN pr1 ON e.src = pr1.doc
           GROUP BY e.dst)
         SELECT doc, r AS rank_micro FROM pr2 ORDER BY doc""")
  }

  def q125Sql: String =
    s"""WITH ${Dedup.bandCtes},
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs),
        deg AS (SELECT src AS doc, count(*) AS d FROM edges GROUP BY src),
        pr1 AS (
          SELECT e.dst AS doc,
            150000 + sum((1000000 * 17 // 20) // dg.d) AS r
          FROM edges e JOIN deg dg ON e.src = dg.doc
          GROUP BY e.dst),
        pr2 AS (
          SELECT e.dst AS doc,
            150000 + sum((pr1.r * 17 // 20) // dg.d) AS r
          FROM edges e
          JOIN deg dg ON e.src = dg.doc
          JOIN pr1 ON e.src = pr1.doc
          GROUP BY e.dst)
        SELECT doc, CAST(r AS BIGINT) AS rank_micro FROM pr2 ORDER BY doc"""
}
