package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational19, Tables}

class Relational19Spec extends SparkTestBase {
  import spark.implicits._

  test("q192 every returned order truly exceeds the quantity threshold") {
    val rows = Relational19.q192LargeVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    val qs = rows.map(_.getAs[Long]("qty"))
    assert(qs.forall(_ > Relational19.LargeQty))
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    // spot-check the top order's quantity against the raw table
    val top = rows.head
    val direct = Tables.lineitem(spark, sf)
      .filter($"l_orderkey" === top.getAs[Long]("orderkey"))
      .agg(sum($"l_quantity")).as[Double].head()
    assert(math.round(direct) == top.getAs[Long]("qty"))
  }

  test("q193 excluded suppliers never appear in any counted group") {
    val rows = Relational19.q193SupplierCount(spark, sf).collect()
    assert(rows.length == 12)
    val nBad = Tables.supplier(spark, sf).filter($"s_acctbal" < 2000).count()
    assert(nBad > 0, "the fixture must exercise the anti join")
    val nSupp = Tables.supplier(spark, sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("supplier_cnt") <= nSupp - nBad,
        "a count reaching the full supplier population would mean the anti join leaked")
    }
  }
}
