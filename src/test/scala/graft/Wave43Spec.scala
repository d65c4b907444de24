package graft

import org.apache.spark.sql.functions._

import graft.engine.{Dedup, Tables, TextQueries}

/** Wave 43 (q279–q280): SimHash banded near-dup join and the shard
  * provenance manifest. Invariants: pigeonhole-exactness of the
  * banding (the whole point of tau < bands), and manifest conservation
  * + checksum determinism. */
class Wave43Spec extends SparkTestBase {

  test("q279 banding is result-invisible: banded pairs == brute-force pairs at tau=3") {
    import spark.implicits._
    val banded = Dedup.q279SimhashNearDup(spark, sf).cache()
    // brute force: ALL doc pairs (C(500,2) at test SF), same verify
    // predicate — pigeonhole says banding must lose nothing at tau < 4
    val sig = Dedup.simhash60Signatures(spark, sf)
    val a = sig.select($"doc_id".as("doc_a"), $"sh".as("ha"))
    val b = sig.select($"doc_id".as("doc_b"), $"sh".as("hb"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
      .filter($"hamming" <= Dedup.PhashTau)
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty,
      "banded candidate generation must equal the all-pairs scan at tau=3")
    assert(banded.count() > 0, "the fixture's near-dup clusters must surface")
    assert(banded.filter($"doc_a" >= $"doc_b").count() === 0)
    banded.unpersist()
  }

  test("q280 manifest conserves docs/tokens and checksums are deterministic") {
    import spark.implicits._
    val m1 = TextQueries.q280ShardManifest(spark, sf).cache()
    // every document lands in exactly one (shard, source) cell
    val totalDocs = m1.agg(sum($"n_docs")).head().getLong(0)
    assert(totalDocs === Tables.documents(spark, sf).count())
    // shard assignment agrees with q81's packing totals
    val q81 = TextQueries.q81ShardPack(spark, sf)
      .select($"shard", $"n_docs".as("q81_docs"), $"n_tokens".as("q81_toks"))
    val byShard = m1.groupBy($"shard")
      .agg(sum($"n_docs").as("m_docs"), sum($"n_tokens").as("m_toks"))
    val mismatch = byShard.join(q81, "shard")
      .filter($"m_docs" =!= $"q81_docs" || $"m_toks" =!= $"q81_toks")
    assert(mismatch.count() === 0, "manifest must describe q81's shards")
    // checksum is a pure function of membership: recomputation matches
    val m2 = TextQueries.q280ShardManifest(spark, sf)
    assert(m1.exceptAll(m2).isEmpty && m2.exceptAll(m1).isEmpty)
    // one checksum per shard (not per source row)
    assert(m1.select($"shard", $"shard_md5").distinct().count() ===
      m1.select($"shard").distinct().count())
    m1.unpersist()
  }
}
