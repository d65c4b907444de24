package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational66, Tables}

/** Wave 86 (q388–q389). Teeth beyond the hash gate: q388 is fully
  * re-simulated in Scala from the collected embedding matrix — every
  * round's pick must be the exact argmax of λ·rel − (1−λ)·maxsim
  * with the same tie-break — and q389's census must cover the corpus
  * with a consistent switch flag. */
class Wave86Spec extends SparkTestBase {

  test("q388 MMR selection re-simulates exactly") {
    import spark.implicits._
    val df = Relational66.q388MmrSelect(spark, sf).orderBy($"sel_order").cache()
    try {
      val picks = df.select($"sel_order", $"vec_id")
        .as[(Long, Long)].collect()
      assert(picks.length === Relational66.Q388K)
      assert(picks.map(_._2).distinct.length === picks.length)
      val vecs = Tables.embeddings(spark, sf)
        .select($"vec_id", $"embedding")
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val qid = vecs.head._1
      def dot(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
        s
      }
      def cos(a: Array[Float], b: Array[Float]): Double =
        dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
      val q = vecs.head._2
      var pool = vecs.tail.map { case (id, v) => (id, v, cos(v, q)) }
      // round 1: pure relevance argmax, ties to smallest id
      var best = pool.maxBy { case (id, _, rel) => (rel, -id) }
      assert(best._1 === picks(0)._2, "round 1 pick")
      var sel = Vector(best)
      var scored = pool.filter(_._1 != best._1)
        .map { case (id, v, rel) => (id, v, rel, cos(v, best._2)) }
      for (i <- 1 until Relational66.Q388K) {
        val pick = scored.maxBy { case (id, _, rel, ms) =>
          (0.7 * rel - 0.3 * ms, -id) }
        assert(pick._1 === picks(i)._2, s"round ${i + 1} pick")
        scored = scored.filter(_._1 != pick._1)
          .map { case (id, v, rel, ms) =>
            (id, v, rel, math.max(ms, cos(v, pick._2))) }
      }
    } finally df.unpersist()
  }

  test("q389 census covers the corpus with a consistent switch flag") {
    import spark.implicits._
    val df = Relational66.q389CodeSwitching(spark, sf).cache()
    try {
      val total = Tables.documents(spark, sf).count()
      assert(df.agg(sum($"n_docs")).as[Long].head() === total)
      assert(df.filter(($"lang_first" =!= $"lang_second") !==
        ($"switched" === 1L)).count() === 0L)
      val langs = Set("en", "de", "fr", "unk")
      df.select($"lang_first", $"lang_second").as[(String, String)]
        .collect().foreach { case (a, b) =>
          assert(langs.contains(a) && langs.contains(b))
        }
    } finally df.unpersist()
  }
}
