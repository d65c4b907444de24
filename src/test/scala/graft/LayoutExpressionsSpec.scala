package graft

import org.apache.spark.sql.functions._

import graft.engine.Relational26
import graft.functions.LayoutExpressions

/** The native codegen Hilbert expression vs the dialect-neutral SQL
  * chain: the two implementations must agree on every cell of the grid
  * (the chain is what the DuckDB oracle executes, the expression is
  * what q249 scans with — any divergence would be an oracle-invisible
  * wrong answer at scale). */
class LayoutExpressionsSpec extends SparkTestBase {

  test("native hilbert_d equals the chained-projection SQL form on the full grid") {
    import spark.implicits._
    val side = Relational26.HSide
    val grid = spark.range(side.toLong * side)
      .select((col("id") / side).cast("long").as("x"),
        (col("id") % side).cast("long").as("y"))
    val both = Relational26.withHilbert(grid, Seq("x", "y"))
      .withColumn("nat", LayoutExpressions.hilbertD($"x", $"y", Relational26.HBits))
    // compare via an aggregate, NOT a filter: pushing a predicate that
    // references hd down through the 8 chained projections would inline
    // the recursion into one 4^bits-node condition (observed OOM); an
    // aggregate references each column once, so the plan stays linear
    val diffs = both
      .agg(sum(when($"nat" =!= $"hd", 1L).otherwise(0L))).head.getLong(0)
    assert(diffs === 0L)
  }

  test("graft_hilbert_d is SQL-registered and interpreted eval matches codegen") {
    graft.GraftExtensions.install(spark)
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT graft_hilbert_d(CAST(7 AS BIGINT), CAST(3 AS BIGINT), 3) AS d")
      .head.getLong(0)
    // 8x8 grid reference value computed by the chain
    val viaChain = Relational26.withHilbert(
      Seq((7L, 3L)).toDF("x", "y"), Seq("x", "y"))
    // the chain is fixed at HBits; compare the 3-bit value against a
    // direct interpreted eval instead
    val interp = LayoutExpressions.HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Literal(7L),
      org.apache.spark.sql.catalyst.expressions.Literal(3L), 3)
      .eval(null).asInstanceOf[Long]
    assert(viaSql === interp)
    assert(viaChain.count() === 1) // chain builds fine on a 1-row frame
  }
}
