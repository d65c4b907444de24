package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational58, Tables}

/** Wave 77 (q363–q365). Teeth beyond the hash gate: q363's pair
  * classification is a partition (every pair lands in exactly one
  * class) and the pair count equals Σ C(n_i, 2) over per-customer
  * order counts; q364's attribution identities (unique kills sum to
  * the n_fired=1 census; loo_retained − unique_kills is the same
  * kept constant for every rule); q365's ablation rows reconstruct
  * the independently-computed grand totals. */
class Wave77Spec extends SparkTestBase {

  test("q363 classes partition the pair set and pair count is sum of C(n,2)") {
    import spark.implicits._
    val df = Relational58.q363KendallTau(spark, sf).cache()
    try {
      val bad = df.filter(
        $"concordant" + $"discordant" + $"ties_date" + $"ties_price" +
          $"ties_both" =!= $"n_pairs").count()
      assert(bad === 0L)
      val badTau = df.filter($"tau_num" =!= $"concordant" - $"discordant")
        .count()
      assert(badTau === 0L)
      val totalPairs = df.agg(sum($"n_pairs")).as[Long].head()
      val expected = Tables.orders(spark, sf)
        .groupBy($"o_custkey").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2"))).as[Long].head()
      assert(totalPairs === expected)
    } finally df.unpersist()
  }

  test("q363 matches a brute-force recount on one nation") {
    import spark.implicits._
    val row = Relational58.q363KendallTau(spark, sf)
      .orderBy($"n_name").limit(1).collect().head
    val name = row.getAs[String]("n_name")
    val orders = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .filter($"n_name" === name)
      .select($"o_custkey",
        datediff(to_date($"o_orderdate"), lit("1995-01-01")).cast("long"),
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
      .as[(Long, Long, Long)].collect()
    var conc = 0L; var disc = 0L
    for {
      (ck, grp) <- orders.groupBy(_._1)
      all = grp.toSeq
      i <- all.indices; j <- (i + 1) until all.size
    } {
      val dd = all(j)._2 - all(i)._2
      val dp = all(j)._3 - all(i)._3
      // pair orientation is okey-ordered in the query but concordance
      // is symmetric under pair swap, so index order is equivalent
      if (dd != 0 && dp != 0) {
        if ((dd > 0) == (dp > 0)) conc += 1 else disc += 1
      }
    }
    assert(row.getAs[Long]("concordant") === conc)
    assert(row.getAs[Long]("discordant") === disc)
  }

  test("q364 attribution identities hold") {
    import spark.implicits._
    val rows = Relational58.q364RuleAttribution(spark, sf).collect()
    assert(rows.map(_.getAs[String]("rule")).toSeq ===
      Seq("dup", "lang", "long", "quality", "short"))
    for (r <- rows)
      assert(r.getAs[Long]("unique_kills") <= r.getAs[Long]("fired"))
    // loo_retained − unique_kills is the kept count — identical per rule
    val kepts = rows.map(r =>
      r.getAs[Long]("loo_retained") - r.getAs[Long]("unique_kills")).toSet
    assert(kepts.size === 1)
    assert(kepts.head >= 0L)
  }

  test("q365 ablation rows reconstruct the grand totals") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val df = Relational58.q365LooAblation(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select($"source", tokenCount($"text").cast("long").as("wc"))
    val perSource = docs.groupBy($"source")
      .agg(count(lit(1)).as("docs"), sum($"wc").as("toks"))
    val (tDocs, tToks) = docs
      .agg(count(lit(1)), sum($"wc")).as[(Long, Long)].head()
    val joined = df.join(perSource, Seq("source")).cache()
    try {
      assert(joined.filter($"loo_docs" + $"docs" =!= tDocs).count() === 0L)
      assert(joined.filter($"loo_toks" + $"toks" =!= tToks).count() === 0L)
      val badPm = joined.filter(
        $"loo_en_permille" < 0 || $"loo_en_permille" > 1000 ||
          $"loo_q_permille" < 0 || $"loo_q_permille" > 1000).count()
      assert(badPm === 0L)
    } finally joined.unpersist()
  }
}
