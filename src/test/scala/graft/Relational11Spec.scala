package graft

import org.apache.spark.sql.functions._

import graft.engine.{Relational11, Tables}

class Relational11Spec extends SparkTestBase {
  import spark.implicits._

  test("q154 skyline rows are exactly the non-dominated parts (brute force)") {
    val pts = Tables.part(spark, sf)
      .select($"p_size".as("size"),
        graft.engine.Exact.cents($"p_retailprice").as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    // brute-force frontier over the 200-part catalog
    def dominated(p: (Int, Long)) = pts.exists { q =>
      q._2 >= p._2 && q._1 <= p._1 && (q._2 > p._2 || q._1 < p._1)
    }
    val expected = pts.filterNot(dominated).distinct.sorted
    val got = Relational11.q154Skyline(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    // multiplicity: n_parts counts the catalog rows at each frontier point
    val counts = Relational11.q154Skyline(spark, sf).agg(sum($"n_parts"))
      .as[Long].head()
    assert(counts == pts.count(p => expected.contains(p)))
  }

  test("q155 grid join finds exactly the brute-force pair set") {
    val pts = Tables.events(spark, sf).select($"event_id").as[Long].collect()
      .map { id =>
        val x = ((id * id) % 99991 + id * 13) % 100000
        val y = ((id * (id + 7)) % 99989 + id * 31) % 100000
        (id, x, y)
      }
    val r2 = Relational11.Radius * Relational11.Radius
    val brute = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r2
    } yield d2 / 25000L).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Relational11.q155GridJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute)
  }

  test("q156 picks the 3 minimum-priority docs per lang, heavier docs favored") {
    val out = Relational11.q156WeightedSample(spark, sf).collect()
    val byLang = out.groupBy(_.getString(0))
    assert(byLang.values.forall(_.length == 3))
    // the selected keys per lang are the true 3 smallest over that lang
    val keyed = Tables.documents(spark, sf)
      .select($"lang", $"doc_id", $"n_chars").collect()
      .map { r =>
        val id = r.getLong(1)
        val u = (id * 2654435761L) % 1000003L + 1L
        (r.getString(0), id, u.toDouble / r.getLong(2))
      }
    byLang.foreach { case (lang, rows) =>
      val expect = keyed.filter(_._1 == lang).sortBy(k => (k._3, k._2))
        .take(3).map(_._2).toSeq
      assert(rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq == expect)
    }
  }

  test("q157 t sign follows the mean gap and df is within Welch bounds") {
    Relational11.q157WelchTtest(spark, sf).collect().foreach { r =>
      val (na, nb) = (r.getAs[Long]("na"), r.getAs[Long]("nb"))
      val gap = r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b")
      val t = r.getAs[Double]("t_stat")
      assert(t.sign == gap.sign || gap == 0.0)
      val df = r.getAs[Double]("df")
      assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2,
        s"Welch df $df outside [min(n)-1, n1+n2-2]")
    }
  }

  test("q158 counts are consistent: n_ab <= min(n_a,n_b), confidence = n_ab/n_a") {
    Relational11.q158BasketLift(spark, sf).collect().foreach { r =>
      val (nab, na, nb) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(nab <= math.min(na, nb))
      assert(r.getAs[Double]("confidence") ==
        math.rint(nab.toDouble / na * 1e6) / 1e6 ||
        math.abs(r.getAs[Double]("confidence") - nab.toDouble / na) < 1e-6)
      assert(r.getAs[Double]("support") <= r.getAs[Double]("confidence"))
    }
  }
}
