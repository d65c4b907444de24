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
  */
object TopKAggregator {

  case class ScoredId(score: Double, id: Long)

  class TopK(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    private def better(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Seq[ScoredId] = Vector.empty

    override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
      if (buf.size < k) (buf :+ in).sortWith(better)
      else if (better(in, buf.last)) (buf.init :+ in).sortWith(better)
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
