package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational27, Tables}

/** Wave 35 (q251–q254): RLE layout economics, CEP sequence motifs, BPE
  * encoding, optimizer-statistics audit. Invariants beyond the hash
  * gate: run-count dominance of leading sort columns, motif containment,
  * merge-table conservation, histogram-mass conservation — plus the
  * no-unpartitioned-window plan posture for the ranked layouts. */
class Wave35Spec extends SparkTestBase {

  test("q251 a leading sort column collapses to ~|distinct| runs; no " +
    "unpartitioned window anywhere in the plan") {
    import spark.implicits._
    val df = Relational27.q251RleRuns(spark, sf)
    val runs = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nFlags = Tables.lineitem(spark, sf)
      .select($"l_returnflag").distinct().count()
    assert(runs(("flag_first", "l_returnflag")) === nFlags,
      "sorting by returnflag first must collapse it to one run per value")
    assert(runs(("flag_first", "l_returnflag")) <
      runs(("arrival", "l_returnflag")))
    assert(runs(("ship_first", "ship_day")) <
      runs(("arrival", "ship_day")),
      "shipdate-led order must shrink shipdate runs vs arrival")
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"ranking must stay bucketed (DistRank): $bad")
  }

  test("q251 the flag_first composite is order-isomorphic to the " +
    "lexicographic (returnflag, linestatus, ship_day, arrival) tuple") {
    import spark.implicits._
    // the r12 review found ship_day bleeding into the linestatus field
    // (7 bits for a 2499-max domain); this pins the repaired layout:
    // sorting by the single BIGINT must yield a lexicographically
    // non-decreasing tuple sequence over the whole fixture
    val keyExpr = Relational27.orders.toMap.apply("flag_first")
    val rows = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_linestatus",
        expr("datediff(to_date(l_shipdate), DATE '1995-01-01')")
          .cast("long").as("ship_day"))
      .withColumn("__k", expr(keyExpr).cast("long"))
      .withColumn("arr",
        ($"l_orderkey" * 8 + $"l_linenumber").cast("long"))
      .select($"l_returnflag", $"l_linestatus", $"ship_day", $"arr", $"__k")
      .orderBy($"__k")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val lex = Ordering.Tuple4[String, String, Long, Long]
    rows.sliding(2).foreach {
      case Array(a, b) => assert(lex.lteq(a, b),
        s"composite order inverted the advertised tuple order: $a > $b")
      case _ =>
    }
  }

  test("q252 motif containment: immediate patterns imply their relaxed forms") {
    val m = Relational27.q252SeqMotif(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every user with an immediate view→purchase also matches v.*p
    assert(m("quick_convert")._1 <= m("conversion")._1)
    m.values.foreach { case (users, matches) =>
      assert(matches >= users, "a matching user contributes ≥ 1 match")
    }
  }

  test("q253 merge conservation: total chars removed equals applied merges") {
    import spark.implicits._
    val res = Relational27.q253BpeEncode(spark, sf)
    val applied = res.agg(sum($"n_applied")).head.getLong(0)
    assert(res.count() === Relational27.BpeEncodeK)
    assert(res.filter($"n_applied" <= 0).count() === 0,
      "a top-8 corpus bigram must fire at least once")
    // each application replaces 2 chars by 1 symbol — the corpus loses
    // exactly one char per merge fired
    val before = Tables.documents(spark, sf)
      .agg(sum(length($"text"))).head.getLong(0)
    val after = before - applied
    assert(after > 0 && applied > 0)
  }

  test("q254 histogram audit conserves mass: per-bucket actuals sum to |lineitem|") {
    import spark.implicits._
    val res = Relational27.q254JoinStats(spark, sf)
    val totalActual = res.agg(sum($"actual")).head.getLong(0)
    val nLi = Tables.lineitem(spark, sf).count()
    assert(totalActual === nLi,
      "every lineitem joins exactly one order, so the bucketed join " +
        "cardinalities must sum to |lineitem|")
    assert(res.filter($"predicted" <= 0).count() === 0)
  }
}
