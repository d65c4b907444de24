package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Ev, SessState}

/** Property-based checks over the engine's pure cores — the pieces whose
  * correctness the oracle gate exercises only at the corpus' specific
  * values. Generators are sampled with fixed seeds (no scalatest-plus
  * bridge in the offline cache), so failures reproduce exactly. */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val GapUs = Sessionize.GapMinutes * 60000000L

  private val tsGen: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 10L * GapUs)).map(_.sorted)

  private def toEvents(micros: Seq[Long]): Seq[Ev] =
    micros.zipWithIndex.map { case (us, i) =>
      Ev(1L, new Timestamp(us / 1000L), i.toLong)
    }

  test("sessionize.advance: sessions partition the events and respect the gap") {
    samples(tsGen).foreach { micros =>
      val evs = toEvents(micros)
      val (st, closed) = Sessionize.advance(SessState(0L, None), evs)
      val sessions = closed ++ st.open
      assert(sessions.map(_.n_events).sum == evs.length)
      assert(sessions.map(_.session_idx) == (1L to sessions.length).toSeq)
      sessions.foreach { s =>
        assert(s.duration_s * 1000000L <= (s.n_events - 1).max(0) * GapUs)
      }
      sessions.sliding(2).foreach {
        case Seq(a, b) =>
          val gap = b.start_ts.getTime * 1000L - a.end_ts.getTime * 1000L
          assert(gap > GapUs - 1000000L) // ms-resolution timestamps in gen
        case _ => ()
      }
    }
  }

  test("advance is incremental: feeding events in two chunks equals one chunk") {
    samples(Gen.zip(tsGen, Gen.chooseNum(0, 100))).foreach { case (micros, splitRaw) =>
      val evs = toEvents(micros)
      val split = if (evs.isEmpty) 0 else splitRaw % (evs.length + 1)
      val (st1, c1) = Sessionize.advance(SessState(0L, None), evs.take(split))
      val (st2, c2) = Sessionize.advance(st1, evs.drop(split))
      val (stAll, cAll) = Sessionize.advance(SessState(0L, None), evs)
      assert((c1 ++ c2 ++ st2.open) == (cAll ++ stAll.open))
    }
  }

  test("TopK reduce/merge equal sort-take-k under any arrival order, incl. NaN") {
    import graft.functions.TopKAggregator.{ScoredId, TopK}
    val scoreGen = Gen.frequency(
      9 -> Gen.chooseNum(-100.0, 100.0),
      1 -> Gen.const(Double.NaN))
    val rowsGen = Gen.listOf(Gen.zip(scoreGen, Gen.chooseNum(0L, 50L)))
      .map(_.map { case (s, id) => ScoredId(s, id) })
    val k = 5
    val agg = new TopK(k)
    // the reference order: Double.compare desc, id asc — total incl. NaN
    def ref(rows: Seq[ScoredId]): Seq[ScoredId] =
      rows.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a.score, b.score)
        c > 0 || (c == 0 && a.id < b.id)
      }.take(k)
    samples(rowsGen, 300).foreach { rows =>
      val viaReduce = rows.foldLeft(agg.zero)(agg.reduce)
      assert(viaReduce.map(r => (r.id, r.score.toString)) ==
        ref(rows).map(r => (r.id, r.score.toString)),
        s"reduce order-independence failed for $rows")
      // split anywhere: merge of partials equals the whole
      val (l, r) = rows.splitAt(rows.size / 2)
      val viaMerge = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(viaMerge.map(_.id) == viaReduce.map(_.id))
    }
  }

  test("scaled-long division equals exact BigDecimal-to-double conversion") {
    samples(Gen.chooseNum(-4000000000000L, 4000000000000L), 2000).foreach { cents =>
      val viaDivision = cents / 100.0
      val viaBigDecimal = new java.math.BigDecimal(cents)
        .movePointLeft(2).doubleValue()
      assert(java.lang.Double.compare(viaDivision, viaBigDecimal) == 0,
        s"cents=$cents: $viaDivision != $viaBigDecimal")
    }
  }

  test("WordShingles emits max(0, n - k + 1) rows of k joined tokens") {
    val gen = Gen.zip(
      Gen.listOf(Gen.identifier.map(_.take(5)).suchThat(_.nonEmpty)),
      Gen.chooseNum(1, 5))
    samples(gen).foreach { case (ts, k) =>
      val expr = graft.functions.WordShingles(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          ts.toArray, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), k)
      val rows = expr.eval(null).iterator.toSeq
      assert(rows.length == math.max(0, ts.length - k + 1))
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(0) == i)
        assert(r.getString(1) == ts.slice(i, i + k).mkString(" "))
      }
    }
  }
}
