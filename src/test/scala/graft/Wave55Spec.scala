package graft

import org.apache.spark.sql.functions._

import graft.engine.{EmbedStats, Tables}

/** Wave 55 (q308–q309): embedding spectral and separation statistics.
  * The power-iteration ladder is re-derived bit-exact in driver-side
  * Scala (independent arithmetic path, same fixed-point contract), and
  * the ANOVA pieces are re-derived for one label by brute force. */
class Wave55Spec extends SparkTestBase {

  private def quantized(scale: Int): Array[(Long, Array[Long])] = {
    import spark.implicits._
    Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * scale).toLong)
      }
  }

  test("q308 ladder matches an independent driver-side reconstruction") {
    import spark.implicits._
    val vecs = quantized(1000).map(_._2)
    val d = vecs.head.length
    val v1 = Array.tabulate(d) { i =>
      vecs.map(q => q(i) * q.sum).sum
    }
    def floorDiv(x: Long, s: Long): Long = Math.floorDiv(x, s)
    val v1s = v1.map(floorDiv(_, 65536L))
    val pn = vecs.map(q => q.zip(v1s).map { case (a, b) => a * b }.sum)
    val v2 = Array.tabulate(d) { i =>
      vecs.zip(pn).map { case (q, p) => q(i) * p }.sum
    }
    val v2s = v2.map(floorDiv(_, 1048576L))
    val num = v1s.zip(v2s).map { case (a, b) => a * b }.sum
    val den = v1s.map(x => x * x).sum
    val got = EmbedStats.q308PowerIteration(spark, sf)
      .orderBy($"dim").as[(Int, Long, Long, Long)].collect()
    assert(got.map(_._2).toSeq === v2s.toSeq)
    assert(got.head._3 === num && got.head._4 === den)
    assert(num > 0 && den > 0, "Rayleigh quotient of a PSD moment matrix")
  }

  test("q309 pieces are nonneg, account for all vectors, and match brute force") {
    import spark.implicits._
    val out = EmbedStats.q309AnovaSeparation(spark, sf).cache()
    try {
      assert(out.filter($"within_num" < 0 || $"between_num" < 0).count() === 0)
      val nTotal = out.agg(sum($"n_vecs")).head().getLong(0)
      assert(nTotal === Tables.embeddings(spark, sf).count())
      // brute-force one label
      val all = Tables.embeddings(spark, sf)
        .select($"label".cast("long"), $"embedding")
        .as[(Long, Array[Float])].collect()
        .map { case (l, e) =>
          l -> e.map(x => math.floor(x.toDouble * 100).toLong)
        }
      val label0 = all.map(_._1).min
      val mine = all.filter(_._1 == label0).map(_._2)
      val d = mine.head.length
      val n = all.length.toLong
      val nc = mine.length.toLong
      val within = (0 until d).map { i =>
        val s = mine.map(_(i)).sum
        val ss = mine.map(q => q(i) * q(i)).sum
        nc * ss - s * s
      }.sum
      val between = (0 until d).map { i =>
        val s = mine.map(_(i)).sum
        val st = all.map(_._2(i)).sum
        val diff = s * n - st * nc
        diff * diff
      }.sum
      val row = out.filter($"label" === label0).head()
      assert(row.getAs[Long]("within_num") === within)
      assert(row.getAs[Long]("between_num") === between)
    } finally out.unpersist()
  }
}
