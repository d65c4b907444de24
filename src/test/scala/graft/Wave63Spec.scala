package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational45, Tables}

/** Wave 63 (q330–q331): replica reconciliation. The corruption is
  * synthesized from doc_id residues, so every expected count is
  * computable in closed form from the id list — the specs do exactly
  * that, and assert the anti-entropy narrowing actually narrows. */
class Wave63Spec extends SparkTestBase {

  private def ids = {
    import spark.implicits._
    Tables.documents(spark, sf).select($"doc_id").as[Long].collect()
  }

  test("q330 repair counts match the residue arithmetic and narrowing narrows") {
    val row = Relational45.q330AntiEntropy(spark, sf).head()
    val all = ids
    val missing = all.filter(_ % 101 == 3)
    val corrupt = all.filter(id => id % 97 == 5 && id % 101 != 3)
    assert(row.getAs[Long]("repairs_missing") === missing.length.toLong)
    assert(row.getAs[Long]("repairs_corrupt") === corrupt.length.toLong)
    // every divergent doc's shard must be flagged — and no more
    val badShards = (missing ++ corrupt).map(_ / 64).distinct.length.toLong
    assert(row.getAs[Long]("bad_shards") === badShards)
    // the whole point: level 2 touches only a fraction of the corpus
    assert(row.getAs[Long]("docs_touched") < row.getAs[Long]("n_docs"))
    assert(row.getAs[Long]("docs_touched") >=
      missing.length.toLong + corrupt.length.toLong)
  }

  test("q331 quorum charges exactly the dissenting replica") {
    val row = Relational45.q331QuorumRepair(spark, sf).head()
    val all = ids
    def bad(mod: Long, res: Long) = all.filter(_ % mod == res).toSet
    val (ba, bb, bc) = (bad(83, 11), bad(97, 5), bad(89, 7))
    // corrupted in >= 2 replicas -> all three hashes differ -> unrecoverable
    val unrec = all.count(id =>
      Seq(ba(id), bb(id), bc(id)).count(identity) >= 2).toLong
    def repairs(mine: Set[Long], o1: Set[Long], o2: Set[Long]) =
      all.count(id => mine(id) && !o1(id) && !o2(id)).toLong
    assert(row.getAs[Long]("unrecoverable") === unrec)
    assert(row.getAs[Long]("repairs_a") === repairs(ba, bb, bc))
    assert(row.getAs[Long]("repairs_b") === repairs(bb, ba, bc))
    assert(row.getAs[Long]("repairs_c") === repairs(bc, ba, bb))
    assert(row.getAs[Long]("repairs_b") > 0, "fixture must exercise a repair")
  }
}
