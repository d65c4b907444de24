package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational50, Tables}

/** Wave 69 (q341–q342): registry algebra and GC planning. Teeth: the
  * composition matrix's functional dependency (each (c12, c23) maps
  * to exactly one c13 — what makes incremental diffs sound), doc-mass
  * conservation across the matrix, and GC counts re-derived from the
  * residue construction. */
class Wave69Spec extends SparkTestBase {

  test("q341 composition is functional and conserves the doc universe") {
    import spark.implicits._
    val m = Relational50.q341DiffCompose(spark, sf).cache()
    try {
      // functional dependency: (c12, c23) -> c13
      val fd = m.groupBy($"c12", $"c23")
        .agg(countDistinct($"c13").as("n13")).filter($"n13" > 1)
      assert(fd.count() === 0,
        "each (c12, c23) pair must determine c13 — incremental diffs compose")
      // mass: every doc_id in v1 ∪ v2 ∪ v3 = all docs appears once
      val total = m.agg(sum($"n_docs")).head().getLong(0)
      assert(total === Tables.documents(spark, sf).count())
      // the unchanged∘unchanged cell dominates and maps to unchanged
      val uu = m.filter($"c12" === "unchanged" && $"c23" === "unchanged")
        .collect()
      assert(uu.length === 1 && uu.head.getAs[String]("c13") === "unchanged")
    } finally m.unpersist()
  }

  test("q342 GC counts follow from the residue construction") {
    import spark.implicits._
    val row = Relational50.q342GcPlan(spark, sf).head()
    assert(row.getAs[Long]("orphan_chunks") > 0,
      "deleted docs must leave orphans")
    assert(row.getAs[Long]("live_chunks") +
      row.getAs[Long]("orphan_chunks") === row.getAs[Long]("stored_chunks"),
      "inventory partitions exactly into live and dead")
    assert(row.getAs[Long]("reclaim_bytes") <= row.getAs[Long]("stored_bytes"))
    val p = row.getAs[Long]("reclaim_permille")
    assert(p > 0 && p < 1000)
  }
}
