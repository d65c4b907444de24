package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Tables, TextQueries}

/** Wave 44 (q281–q283): duplication flow matrix, vocab coverage, and
  * the takedown rewrite plan. Invariants: matrix/pair conservation,
  * coverage bounds, and checksum agreement with the q280 manifest on
  * untouched shards. */
class Wave44Spec extends SparkTestBase {

  test("q281 matrix is canonical and conserves the q21 pair count") {
    import spark.implicits._
    val m = Dedup.q281DupFlowMatrix(spark, sf)
    assert(m.filter($"src_a" > $"src_b").count() === 0,
      "unordered source pairs must be canonicalized (src_a <= src_b)")
    val total = m.agg(sum($"n_pairs")).head().getLong(0)
    assert(total === Dedup.q21MinhashLsh(spark, sf).count(),
      "every candidate pair lands in exactly one matrix cell")
  }

  test("q282 coverage respects bounds and the vocab actually covers the head") {
    import spark.implicits._
    val c = TextQueries.q282VocabCoverage(spark, sf)
    assert(c.filter($"oov_permille" < 0 || $"oov_permille" > 1000).count() === 0)
    assert(c.filter($"covered" > $"n_tokens").count() === 0)
    // a 512-token vocab over a synthetic corpus must cover the large
    // majority of the stream (the head of any zipf-ish distribution)
    val agg = c.agg(sum($"covered"), sum($"n_tokens")).head()
    assert(agg.getLong(0) * 10 > agg.getLong(1) * 5,
      "top-512 vocab should cover more than half the token stream")
  }

  test("q283 plan agrees with the q280 manifest and conserves the takedown set") {
    import spark.implicits._
    val plan = TextQueries.q283TakedownPlan(spark, sf).cache()
    val manifest = TextQueries.q280ShardManifest(spark, sf)
      .select($"shard", $"shard_md5").distinct()
    // untouched shards keep their manifest checksum verbatim
    val untouched = plan.filter($"n_remove" === 0)
      .join(manifest, "shard")
      .filter($"kept_md5" =!= $"shard_md5")
    assert(untouched.count() === 0,
      "a shard with nothing to remove must reproduce its q280 checksum")
    // the plan covers exactly the deterministic takedown set
    val planned = plan.agg(sum($"n_remove")).head().getLong(0)
    val actual = Tables.documents(spark, sf)
      .filter($"doc_id" % TextQueries.TakedownMod === TextQueries.TakedownRes)
      .count()
    assert(planned === actual)
    assert(planned > 0, "the takedown selector must be non-empty at test SF")
    plan.unpersist()
  }
}
