package graft

import org.apache.spark.sql.functions._

import graft.engine.{Similarity, Tables}

/** Pins [[Similarity.autoPlanes]] — the turnkey form of the
  * `spark.graft.lsh.planes` production knob: (1) the sizing function's
  * contract (expected |bucket| ≈ target under planes = ⌈log₂(n/t)⌉,
  * floor at the gated default, cap at the 16-bit bucket width), (2)
  * `planes=auto` drives the mining path end-to-end and the mined
  * negative is still the true in-bucket hardest AT the auto-chosen
  * count (brute-force recomputed), and (3) the gated default path is
  * byte-identical with the conf unset — auto is opt-in. */
class AutoPlanesSpec extends SparkTestBase {

  test("autoPlanes holds the expected bucket population at the target") {
    // exact powers: n/t = 2^k → exactly k planes (within the clamp)
    assert(Similarity.autoPlanes(4096L << 4, 4096) === 4)
    assert(Similarity.autoPlanes(4096L << 10, 4096) === 10)
    // non-powers round UP (never over-populate the bucket)
    assert(Similarity.autoPlanes((4096L << 4) + 1, 4096) === 5)
    // floor: a small corpus keeps the gated 16-bucket default
    assert(Similarity.autoPlanes(100, 4096) === Similarity.DefaultLshPlanes)
    assert(Similarity.autoPlanes(1, 1) === Similarity.DefaultLshPlanes)
    // cap: the bit-sum bucket id carries 16 planes
    assert(Similarity.autoPlanes(Long.MaxValue / 2, 1) === 16)
    // +1 plane per corpus doubling — the linearity argument itself
    val ns = (0 to 8).map(k => 4096L << (4 + k))
    val ps = ns.map(Similarity.autoPlanes(_, 4096))
    assert(ps === (4 to 12), s"one plane per doubling, got $ps")
    intercept[IllegalArgumentException](Similarity.autoPlanes(0, 4096))
    intercept[IllegalArgumentException](Similarity.autoPlanes(10, 0))
  }

  test("planes=auto mines the true in-bucket hardest at the auto-chosen count") {
    import spark.implicits._
    val default = Similarity.q288HardNegatives(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    // target 8 on the 500-vector fixture → 6 planes: genuinely above
    // the floor, so the auto path is proven to CHANGE the index
    val autoP = Similarity.autoPlanes(n, 8)
    assert(autoP > Similarity.DefaultLshPlanes)
    spark.conf.set("spark.graft.lsh.planes", "auto")
    spark.conf.set("spark.graft.lsh.targetBucket", "8")
    try {
      val mined = Similarity.q288HardNegatives(spark, sf)
        .select($"anchor_id", $"hard_neg_id", $"cos", $"n_negs")
        .as[(Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
      val vecs = Tables.embeddings(spark, sf)
        .select($"vec_id", $"label", $"embedding")
        .as[(Long, Int, Array[Float])].collect()
      def bucket(e: Array[Float], planes: Int): Int =
        (0 until planes).map { j =>
          val s = ((j + 1) to e.length by planes)
            .map(i => e(i - 1).toDouble).reduce(_ + _)
          if (s > 0) 1 << j else 0
        }.sum
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (i <- a.indices) {
          d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i)
        }
        d / math.sqrt(na * nb)
      }
      val byBucket = vecs.groupBy(v => bucket(v._3, autoP))
      var checked = 0
      vecs.foreach { case (id, label, emb) =>
        val negs = byBucket(bucket(emb, autoP)).filter(_._2 != label)
        if (negs.isEmpty) assert(!mined.contains(id))
        else {
          // fp-robust argmax (the Wave47 discipline): the engine's fold
          // and this loop sum in different orders, so pin membership in
          // the eps-tied max set, exact id only when the winner is clear
          val scored = negs.map(v => (cos(emb, v._3), v._1))
          val maxCos = scored.map(_._1).max
          val tied = scored.filter(_._1 >= maxCos - 1e-9).map(_._2)
          val got = mined(id)
          assert(tied.contains(got._2),
            s"anchor $id: mined ${got._2} not among eps-tied max $tied")
          if (tied.size == 1) assert(got._2 === tied.head)
          assert(math.abs(got._3 - maxCos) < 1e-6)
          assert(got._4 === negs.length.toLong)
          checked += 1
        }
      }
      assert(checked > 0)
      // the auto index is genuinely the widened one, not the default
      assert(mined.size != default.length ||
        default.exists(r => mined(r.getLong(0))._2 != r.getLong(2)),
        "auto at target=8 must produce a different bucketing than planes=4")
    } finally {
      spark.conf.unset("spark.graft.lsh.planes")
      spark.conf.unset("spark.graft.lsh.targetBucket")
    }
    // gated default is untouched after unset
    val again = Similarity.q288HardNegatives(spark, sf).collect()
    assert(again.map(_.toString).toSeq === default.map(_.toString).toSeq)
  }
}
