package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.engine.{Relational73, Tables}

/** Wave 93 (q407–q409). Teeth beyond the hash gate: q407's two cache
  * policies are replayed access-by-access in Scala (and OPT must
  * dominate LRU per user); q408's margins are recomputed brute-force
  * from the quantized embeddings; q409's salted reducer loads are
  * recomputed from the histogram with an independent md5. */
class Wave93Spec extends SparkTestBase {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def typeId(t: String): Int = t match {
    case "click" => 0; case "error" => 1; case "purchase" => 2
    case "signup" => 3; case "view" => 4; case _ => 5
  }

  test("q407 both policies replay exactly; OPT dominates LRU") {
    import spark.implicits._
    val row = Relational73.q407OptVsLru(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val (nUsers, accesses, lruHits, optHits, lruPm, optPm, below) = row
    assert(below === 0L)
    assert(optHits >= lruHits)
    assert(lruPm === 1000L * lruHits / accesses)
    assert(optPm === 1000L * optHits / accesses)
    val seqs = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))
        .map(e => typeId(e._4)).toList).toMap
    assert(nUsers === seqs.size.toLong)
    assert(accesses === seqs.values.map(_.size.toLong).sum)
    var lru = 0L; var opt = 0L
    for ((_, s) <- seqs) {
      // LRU, 2 slots
      var a = -1; var b = -1 // a = MRU
      var uh = 0L
      for (x <- s) {
        if (x == a) uh += 1
        else if (x == b) { b = a; a = x; uh += 1 }
        else { b = a; a = x }
      }
      lru += uh
      // Belady OPT: evict farthest next use
      val arr = s.toArray
      val next = Array.fill(arr.length)(999999)
      val last = scala.collection.mutable.Map.empty[Int, Int]
      for (i <- arr.indices.reverse) {
        next(i) = last.getOrElse(arr(i), 999999)
        last(arr(i)) = i
      }
      var sa = -1; var sb = -1; var na = 999999; var nb = 999999
      var oh = 0L
      for (i <- arr.indices) {
        val x = arr(i)
        if (x == sa) { oh += 1; na = next(i) }
        else if (x == sb) { oh += 1; nb = next(i) }
        else if (na >= nb) { sa = x; na = next(i) }
        else { sb = x; nb = next(i) }
      }
      opt += oh
      assert(oh >= uh)
    }
    assert(lru === lruHits)
    assert(opt === optHits)
  }

  test("q408 margins recompute brute-force from the quantized grid") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label".cast("long"), $"embedding")
      .as[(Long, Long, Seq[Float])].collect()
    val scaled = emb.map { case (id, l, e) =>
      (id, l, e.map(v => math.floor(v * Relational73.Q408Scale).toLong +
        Relational73.Q408Shift).toArray)
    }
    val byLabel = scaled.groupBy(_._2)
    val cents = byLabel.map { case (l, vs) =>
      val n = vs.length.toLong
      l -> Array.tabulate(vs.head._3.length)(d =>
        vs.map(_._3(d)).sum / n)
    }
    val sel = scaled.map { case (id, _, x) =>
      val keys = cents.toSeq.map { case (l, c) =>
        val d2 = x.indices.map(d => (x(d) - c(d)) * (x(d) - c(d))).sum
        d2 * 16L + l
      }.sorted
      (id, keys(0) % 16, keys(1) % 16, keys(1) / 16 - keys(0) / 16)
    }.sortBy(t => (t._4, t._1)).take(Relational73.Q408K)
    val expect = sel.groupBy(t => (t._2, t._3)).map { case ((bl, sl), xs) =>
      (bl, sl, xs.size.toLong, xs.map(_._4).min, xs.map(_._4).max)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = Relational73.q408MarginSampling(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  test("q409 salted loads recompute from the histogram") {
    import spark.implicits._
    val hist = Tables.events(spark, sf)
      .groupBy($"event_type").agg(count(lit(1)))
      .as[(String, Long)].collect().toMap
    val expect = Relational73.Q409Salts.map { s =>
      val loads = scala.collection.mutable.Map.empty[Long, Long]
      for ((k, cnt) <- hist; r <- 0 until s) {
        val p = java.lang.Long.parseLong(
          md5hex(s"$k#$r").take(15), 16) % Relational73.Q409Parts
        val share = cnt / s + (if (r < cnt % s) 1L else 0L)
        loads(p) = loads.getOrElse(p, 0L) + share
      }
      val total = loads.values.sum
      (s.toLong, loads.values.max, loads.size.toLong,
        1000L * loads.values.max * Relational73.Q409Parts / total)
    }
    val got = Relational73.q409SaltingFrontier(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    // every salt level preserves total mass
    val totalEvents = hist.values.sum
    got.foreach { case (s, maxLoad, _, _) =>
      assert(maxLoad <= totalEvents && maxLoad >= totalEvents / 32 )
    }
  }
}
