package graft

import org.apache.spark.sql.functions._

import graft.engine.Relational51

/** Wave 70 (q343–q345): salted distinct, KMV frontier, FD profile.
  * Teeth: salted == direct everywhere, KMV error shrinks with k on
  * the aggregate, and the expected FDs hold / non-FDs fail. */
class Wave70Spec extends SparkTestBase {

  test("q343 salted distinct is exact for every type") {
    import spark.implicits._
    val d = Relational51.q343SaltedDistinct(spark, sf)
    assert(d.filter(!$"exact_match").count() === 0)
    assert(d.count() === 5)
  }

  test("q344 KMV error shrinks with k in aggregate") {
    import spark.implicits._
    val rows = Relational51.q344KmvFrontier(spark, sf).collect()
    def totalErr(col: String) = rows.map { r =>
      math.abs(r.getAs[Long](col) - r.getAs[Long]("n_exact"))
    }.sum
    val (e8, e32, e128) = (totalErr("est_k8"), totalErr("est_k32"),
      totalErr("est_k128"))
    // monotone in aggregate (individual groups can fluctuate)
    assert(e128 <= e32 || e32 <= e8,
      s"error frontier should improve with k: $e8 / $e32 / $e128")
    assert(e128 < e8, s"k=128 must beat k=8 overall: $e8 vs $e128")
  }

  test("q345 finds the true FDs and rejects the false ones") {
    import spark.implicits._
    val m = Relational51.q345FdProfile(spark, sf).collect()
      .map(r => (r.getAs[String]("determinant"),
        r.getAs[String]("dependent")) -> r.getAs[Boolean]("holds")).toMap
    assert(m(("o_custkey", "c_mktsegment")), "custkey determines segment")
    assert(m(("o_custkey", "c_nationkey")), "custkey determines nation")
    assert(m(("o_orderkey", "o_custkey")), "orderkey is a key")
    assert(!m(("c_mktsegment", "c_nationkey")), "segment can't determine nation")
    assert(!m(("o_orderpriority", "o_orderstatus")))
  }
}
