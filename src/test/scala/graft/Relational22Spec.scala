package graft

import graft.engine.Relational22
import graft.plans.RangeJoinRule

class Relational22Spec extends SparkTestBase {

  test("q210 rule turns the BETWEEN join from nested-loop into a hash join, rows identical") {
    // without the rule: no equi key exists — Spark can only nested-loop
    val unset = spark.conf.getOption(RangeJoinRule.BinSizeKey)
    try {
      spark.conf.unset(RangeJoinRule.BinSizeKey)
      val plain = Relational22.q210Join(spark, sf)
      assert(plain.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "the un-rewritten range join must be the nested-loop baseline")
      val plainRows = plain.collect()

      // with the rule: banded equi key extracted, no nested loop anywhere
      RangeJoinRule.register(spark)
      spark.conf.set(RangeJoinRule.BinSizeKey, Relational22.BinSize.toString)
      val rewritten = Relational22.q210Join(spark, sf)
      val p = rewritten.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
             !p.contains("CartesianProduct"),
        "the rewritten join must plan on the bucket equi key:\n" + p)
      assert(rewritten.queryExecution.optimizedPlan.toString
        .contains("__graft_bucket"),
        "the rewrite must inject the bucket attribute")
      assert(rewritten.collect().toSeq == plainRows.toSeq,
        "the rewrite must be output-identical")
    } finally unset match {
      case Some(v) => spark.conf.set(RangeJoinRule.BinSizeKey, v)
      case None => spark.conf.unset(RangeJoinRule.BinSizeKey)
    }
  }

  test("q219 rule turns the TIMESTAMP BETWEEN join into a hash join, rows identical") {
    val unset = spark.conf.getOption(RangeJoinRule.BinSizeKey)
    try {
      spark.conf.unset(RangeJoinRule.BinSizeKey)
      val plain = Relational22.q219Join(spark, sf)
      assert(plain.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"),
        "the un-rewritten timestamp range join must be the nested-loop baseline")
      val plainRows = plain.collect()

      RangeJoinRule.register(spark)
      spark.conf.set(RangeJoinRule.BinSizeKey, Relational22.TsBinSeconds.toString)
      val rewritten = Relational22.q219Join(spark, sf)
      val p = rewritten.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
             !p.contains("CartesianProduct"),
        "the rewritten timestamp join must plan on the bucket equi key:\n" + p)
      assert(rewritten.queryExecution.optimizedPlan.toString
        .contains("__graft_bucket"),
        "the rewrite must inject the bucket attribute")
      assert(rewritten.collect().toSeq == plainRows.toSeq,
        "the timestamp rewrite must be output-identical")
    } finally unset match {
      case Some(v) => spark.conf.set(RangeJoinRule.BinSizeKey, v)
      case None => spark.conf.unset(RangeJoinRule.BinSizeKey)
    }
  }

  test("rule is a no-op on equi joins and non-integral range predicates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    RangeJoinRule.register(spark)
    val unset = spark.conf.getOption(RangeJoinRule.BinSizeKey)
    try {
      spark.conf.set(RangeJoinRule.BinSizeKey, "100")
      // plain equi join: no range pair → untouched
      val a = Seq((1L, 2L)).toDF("k", "v")
      val b = Seq((1L, 3L)).toDF("bk", "w")
      val eq = a.join(b, $"k" === $"bk")
      assert(!eq.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      // double-typed range: monotonicity of integral div doesn't apply → untouched
      val c = Seq((1.5, 1L)).toDF("x", "id")
      val d = Seq((1.0, 2.0)).toDF("lo", "hi")
      val rj = c.join(d, $"x" >= $"lo" && $"x" <= $"hi")
      assert(!rj.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      assert(rj.count() == 1)
    } finally unset match {
      case Some(v) => spark.conf.set(RangeJoinRule.BinSizeKey, v)
      case None => spark.conf.unset(RangeJoinRule.BinSizeKey)
    }
  }
}
