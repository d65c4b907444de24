package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs
  * per group with a fixed-size buffer.
  *
  * Why not `row_number().over(Window.partitionBy(g).orderBy(...))`:
  * the window form shuffles and sorts EVERY scored row. This aggregator
  * truncates map-side — each partition ships at most k rows per group to
  * the reducer — which is the difference between shuffling the corpus
  * and shuffling k·groups rows at 100 TB. (The window form is kept in
  * q24/q25 as the reference formulation; q38 is this one, asserted
  * row-identical against the same oracle.)
  *
  * Determinism: total order (score desc, id asc), ties broken by id, so
  * partial merges commute and the result is partitioning-independent.
  * Scores compare via `java.lang.Double.compare`, which is a TOTAL
  * order including NaN (NaN ranks above every finite score — the same
  * "NaN is largest" convention Spark's window ordering and DuckDB's
  * DESC sort use, so a NaN score cannot make reduce/merge
  * order-dependent or diverge from the q24 window oracle; naive
  * `>`/`==` comparisons are BOTH false for NaN, which would poison the
  * buffer's tail and reject every later row).
  */
object TopKAggregator {

  case class ScoredId(score: Double, id: Long)

  class TopK(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    private def better(a: ScoredId, b: ScoredId): Boolean = {
      val c = java.lang.Double.compare(a.score, b.score)
      c > 0 || (c == 0 && a.id < b.id)
    }

    override def zero: Seq[ScoredId] = Vector.empty

    /** The buffer is kept sorted best-first; insertion finds the slot
      * with one linear scan instead of re-sorting k elements per
      * accepted row — this is the hot map-side loop the aggregator
      * exists to optimize. */
    private def insert(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
      val at = buf.indexWhere(b => better(in, b)) match {
        case -1 => buf.size
        case i  => i
      }
      (buf.take(at) :+ in) ++ buf.drop(at)
    }

    override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
      if (buf.size < k) insert(buf, in)
      else if (better(in, buf.last)) insert(buf.init, in)
      else buf

    override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
      (b1 ++ b2).sortWith(better).take(k)

    override def finish(reduction: Seq[ScoredId]): Seq[ScoredId] = reduction

    override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  }

  /** Column API: `top_k(score, id)` → array<struct<score,id>> of the k
    * best, ordered. Explode with posexplode for (rank, id, score) rows. */
  def top_k(k: Int)(score: Column, id: Column): Column = {
    val fn = udaf(new TopK(k), ExpressionEncoder[ScoredId]())
    fn(score, id)
  }
}
