package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Wave 53 (q302–q303): alternating-star connected components and the
  * bipartite co-occurrence projection. The load-bearing check: the
  * star-contraction labels agree LABEL-FOR-LABEL with the repo's
  * independent HashMin propagation (two different algorithms, one
  * answer), and the projection's pair mass equals the per-part
  * degree-choose-2 sum. */
class Wave53Spec extends SparkTestBase {

  private def edges = {
    import spark.implicits._
    Tables.lineitem(spark, sf)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-02-01").cast("timestamp"))
      .select(($"l_suppkey" * 2).as("u"), ($"l_partkey" * 2 + 1).as("v"))
      .distinct()
  }

  test("alternating-star labels equal HashMin propagation labels") {
    import spark.implicits._
    val star = GraphQueries.alternatingStar(edges)
      .select($"node", $"comp").as[(Long, Long)].collect().toMap
    // Independent reference: the q67 HashMin propagation over the same
    // edge list (renamed to its doc_a/doc_b contract).
    val hashmin = Dedup.clustersFromPairs(spark,
        edges.select($"u".as("doc_a"), $"v".as("doc_b")))
      .as[(Long, Long)].collect().toMap
    assert(star === hashmin)
    // Every component labels itself by its min member.
    val byComp = star.groupBy(_._2).map { case (c, ms) => c -> ms.keys.min }
    assert(byComp.forall { case (c, mn) => c == mn })
  }

  test("q302 shape histogram accounts for every node") {
    import spark.implicits._
    val hist = GraphQueries.q302ConnectedComponents(spark, sf)
    val nodesInHist = hist
      .agg(sum(($"n_supp" + $"n_part") * $"n_components")).head().getLong(0)
    val nNodes = edges.select($"u").union(edges.select($"v")).distinct().count()
    assert(nodesInHist === nNodes)
  }

  test("q303 pair mass equals per-part degree-choose-2") {
    import spark.implicits._
    val matrix = GraphQueries.q303CoSupplierMatrix(spark, sf)
    val got = matrix.agg(sum($"n_pairs")).head().getLong(0)
    val want = edges
      .groupBy($"v").agg(count(lit(1)).as("d"))
      .agg(sum(expr("d * (d - 1) div 2"))).head().getLong(0)
    assert(got === want)
    // Canonical ordering: nation_a <= nation_b always.
    assert(matrix.filter($"nation_a" > $"nation_b").count() === 0)
  }
}
