package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational34, Tables}

/** Wave 49 (q292–q293): version diff and tie-preserving top-k.
  * Invariants: diff classes partition both versions exactly; every
  * tie of an admitted quantity is present. */
class Wave49Spec extends SparkTestBase {

  test("q292 diff classes partition both corpus versions") {
    import spark.implicits._
    val d = Relational34.q292VersionDiff(spark, sf)
    def classTotal(c: String) =
      d.filter($"class" === c).agg(coalesce(sum($"n_docs"), lit(0L)))
        .head().getLong(0)
    val nV2 = Tables.documents(spark, sf).count()
    val nV1 = Tables.documents(spark, sf).filter($"doc_id" % 17 =!= 2).count()
    // v2 = added + changed + unchanged; v1 = removed + changed + unchanged
    assert(classTotal("added") + classTotal("changed") +
      classTotal("unchanged") === nV2)
    assert(classTotal("removed") + classTotal("changed") +
      classTotal("unchanged") === nV1)
    assert(classTotal("added") === Tables.documents(spark, sf)
      .filter($"doc_id" % 17 === 2).count())
    assert(classTotal("changed") > 0 && classTotal("removed") === 0,
      "v1 ⊂ v2 here: docs change or appear, none vanish")
  }

  test("q293 keeps EVERY tie of an admitted quantity and exactly 3 ranks per flag") {
    import spark.implicits._
    val t = Relational34.q293TopKTies(spark, sf)
    val ranks = t.groupBy($"l_returnflag")
      .agg(countDistinct($"rk").as("nrk"), max($"rk").as("mrk"))
    assert(ranks.filter($"nrk" =!= 3 || $"mrk" =!= 3).count() === 0,
      "each flag reports exactly dense ranks 1..3")
    // tie completeness: n_rows for each (flag, qty) equals the raw count
    val li = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity".cast("long").as("qty"))
      .groupBy($"l_returnflag", $"qty").agg(count(lit(1)).as("raw"))
    val bad = t.join(li, Seq("l_returnflag", "qty"))
      .filter($"n_rows" =!= $"raw")
    assert(bad.count() === 0, "a tie class must surface all its rows")
  }
}
