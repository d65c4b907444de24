package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global `row_number()` — the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))`, whose physical plan funnels
  * EVERY row through one partition (Exchange SinglePartition + a
  * single-threaded sort: the q92/q170 weakness flagged in round 5).
  *
  * Mechanism (the q141 approx-cut-point discipline applied to ranking):
  *   1. One aggregate computes `percentile_approx` cut points of the
  *      sort key; they ride a broadcast to every task.
  *   2. Each row gets an order-preserving bucket index — the count of
  *      cut points below its key (a pure projection).
  *   3. `row_number()` over a window PARTITIONED by bucket ranks each
  *      bucket in parallel (one shuffle by bucket, local sorts).
  *   4. Each bucket's exclusive prefix count — from a |buckets|-sized
  *      triangular broadcast join, NOT a global window — lifts local
  *      ranks to global ones.
  *
  * The result is EXACT no matter where the cut points fall: bucketing
  * by the leading key alone is order-preserving (equal keys share a
  * bucket, so tie-breaks resolve inside the bucket's local sort), and
  * global rank = bucket offset + local rank. `percentile_approx`
  * nondeterminism can only unbalance buckets, never change a rank —
  * which is what makes this form safe for hash-gated oracles. That
  * argument needs ONE cut-point evaluation shared by both consuming
  * branches (the ranking window and the bucket-population aggregate):
  * relying on Catalyst exchange reuse to dedup the two broadcast
  * subtrees would make correctness hostage to an optimizer flag, so
  * `cuts` is localCheckpoint'ed — one row, evaluated exactly once.
  *
  * Scale: `nBuckets` is the parallelism knob — size it so |rows|/buckets
  * fits one task's sort buffer (the same contract as
  * `repartitionByRange`); skew is bounded by the key's value skew
  * (heavily duplicated keys share a bucket — pre-salt the TIE column if
  * one key dominates, as q45 does for joins).
  */
object DistRank {

  /** Adds `rankName` = the global 1-based row_number of each row under
    * (`key` desc-or-asc, `tie` asc). `key` and `tie` must be numeric /
    * orderable columns; ties beyond (key, tie) must not exist if the
    * rank feeds a hash-gated oracle (same contract as the window form).
    */
  def withRank(df: DataFrame, key: String, tie: String, rankName: String,
      desc: Boolean, nBuckets: Int = 16): DataFrame = {
    require(nBuckets > 1, "nBuckets must exceed 1")
    val b = s"__b_$rankName"
    val lrn = s"__lrn_$rankName"
    val off = s"__off_$rankName"
    val probs = typedlit((1 until nBuckets).map(_.toDouble / nBuckets))
    val cuts = df.agg(
      percentile_approx(col(key), probs, lit(10000)).as("__cuts"))
      .localCheckpoint()
    // explicit bucket exchange (r14): the ranking window and the
    // bucket-population aggregate both consume `bucketed`, and each
    // consumer used to re-derive df from scratch behind its own
    // implicit exchange. Repartitioning by bucket HERE gives both
    // consumers the exact same exchange subtree — ReusedExchange makes
    // the input evaluate once and shuffle once (the window needed this
    // exchange anyway; the aggregate now reads it instead of paying a
    // second derivation + partial-agg exchange).
    val bucketed = df.crossJoin(broadcast(cuts))
      .withColumn(b,
        expr(s"aggregate(__cuts, 0, (a, c) -> a + IF($key > c, 1, 0))"))
      .drop("__cuts")
      .repartition(col(b))
    val order =
      if (desc) Seq(col(key).desc, col(tie).asc) else Seq(col(key).asc, col(tie).asc)
    val local = bucketed.withColumn(lrn,
      row_number().over(Window.partitionBy(col(b)).orderBy(order: _*)).cast("long"))
    val counts = bucketed.groupBy(col(b)).agg(count(lit(1)).as("__cnt"))
    // Exclusive prefix counts over the |buckets|-row frame: a triangular
    // broadcast join instead of a cumulative window, so the WHOLE plan
    // is free of single-partition window stages (plan-asserted in
    // PlanAssertionsSpec). desc ranks start after all HIGHER buckets.
    val earlier = counts.select(col(b).as("__ob"), col("__cnt").as("__ocnt"))
    val cond = if (desc) col("__ob") > col(b) else col("__ob") < col(b)
    val offsets = counts.join(broadcast(earlier), cond, "left")
      .groupBy(col(b))
      .agg(coalesce(sum(col("__ocnt")), lit(0L)).as(off))
    local.join(broadcast(offsets), b)
      .withColumn(rankName, col(off) + col(lrn))
      .drop(b, lrn, off)
  }

  /** Adds `outName` = the running max of `value` over the GLOBAL order
    * (`key` asc, `tie` asc) — the scale-safe replacement for
    * `max(v) OVER (ORDER BY key, tie ROWS UNBOUNDED PRECEDING)`, whose
    * physical plan funnels every row through one WindowExec partition.
    *
    * Same two-level discipline as [[withRank]]: percentile_approx cut
    * points bucket rows order-preservingly by `key` (equal keys share a
    * bucket, so intra-bucket (key, tie) sorts resolve the global order);
    * each bucket computes its LOCAL running max in parallel; each
    * bucket's overall max feeds a |buckets|-row triangular broadcast
    * join that yields the exclusive prefix max of all EARLIER buckets;
    * global running max = greatest(local running max, prefix max).
    * Spark's `greatest` ignores nulls, so the first bucket (null
    * prefix) degrades to its local running max — exact. */
  def withRunningMax(df: DataFrame, key: String, tie: String, value: String,
      outName: String, nBuckets: Int = 16): DataFrame = {
    require(nBuckets > 1, "nBuckets must exceed 1")
    val b = s"__b_$outName"
    val lmax = s"__lmax_$outName"
    val pmax = s"__pmax_$outName"
    val probs = typedlit((1 until nBuckets).map(_.toDouble / nBuckets))
    val cuts = df.agg(
      percentile_approx(col(key), probs, lit(10000)).as("__cuts"))
      .localCheckpoint()
    val bucketed = df.crossJoin(broadcast(cuts))
      .withColumn(b,
        expr(s"aggregate(__cuts, 0, (a, c) -> a + IF($key > c, 1, 0))"))
      .drop("__cuts")
      .repartition(col(b))
    val local = bucketed.withColumn(lmax,
      max(col(value)).over(Window.partitionBy(col(b))
        .orderBy(col(key).asc, col(tie).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bmax = bucketed.groupBy(col(b)).agg(max(col(value)).as("__bm"))
    val earlier = bmax.select(col(b).as("__ob"), col("__bm").as("__obm"))
    val prefixes = bmax.join(broadcast(earlier), col("__ob") < col(b), "left")
      .groupBy(col(b))
      .agg(max(col("__obm")).as(pmax))
    local.join(broadcast(prefixes), b)
      .withColumn(outName, greatest(col(lmax), col(pmax)))
      .drop(b, lmax, pmax)
  }

  /** Adds, for each `(value, outName)` pair, `outName` = the INCLUSIVE
    * running sum of `value` over the GLOBAL order (`key` asc, `tie`
    * asc) — the scale-safe replacement for
    * `sum(v) OVER (ORDER BY key, tie ROWS UNBOUNDED PRECEDING)`, the
    * exact-CDF / midrank primitive the rank-statistics queries (q297
    * KS numerators, q299 midranks) are built on.
    *
    * Same two-level discipline as [[withRank]]/[[withRunningMax]], one
    * shuffle for ANY number of summed columns: order-preserving
    * bucketing by percentile cut points, per-bucket local running sums
    * in parallel, then a |buckets|-row triangular broadcast join whose
    * exclusive prefix totals lift local sums to global ones. Callers
    * own overflow discipline: partial sums must stay within long range
    * (counts and cents against ~10^5-row-scale frames are ≤10^13 —
    * audit before reusing on a new measure). */
  def withRunningSums(df: DataFrame, key: String, tie: String,
      sums: Seq[(String, String)], nBuckets: Int = 16): DataFrame = {
    require(nBuckets > 1, "nBuckets must exceed 1")
    require(sums.nonEmpty, "at least one (value, outName) pair")
    val b = s"__b_${sums.head._2}"
    val probs = typedlit((1 until nBuckets).map(_.toDouble / nBuckets))
    val cuts = df.agg(
      percentile_approx(col(key), probs, lit(10000)).as("__cuts"))
      .localCheckpoint()
    val bucketed = df.crossJoin(broadcast(cuts))
      .withColumn(b,
        expr(s"aggregate(__cuts, 0, (a, c) -> a + IF($key > c, 1, 0))"))
      .drop("__cuts")
      .repartition(col(b))
    val w = Window.partitionBy(col(b))
      .orderBy(col(key).asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(bucketed) { case (acc, (v, out)) =>
      acc.withColumn(s"__l_$out", sum(col(v)).over(w))
    }
    val btot = bucketed.groupBy(col(b))
      .agg(sums.map { case (v, out) => sum(col(v)).as(s"__t_$out") }.head,
        sums.tail.map { case (v, out) => sum(col(v)).as(s"__t_$out") }: _*)
    val earlier = btot.select((col(b).as("__ob") +:
      sums.map { case (_, out) => col(s"__t_$out").as(s"__e_$out") }): _*)
    val prefixes = btot.join(broadcast(earlier), col("__ob") < col(b), "left")
      .groupBy(col(b))
      .agg(sums.map { case (_, out) =>
          coalesce(sum(col(s"__e_$out")), lit(0L)).as(s"__p_$out") }.head,
        sums.tail.map { case (_, out) =>
          coalesce(sum(col(s"__e_$out")), lit(0L)).as(s"__p_$out") }: _*)
    val lifted = sums.foldLeft(local.join(broadcast(prefixes), b)) {
      case (acc, (_, out)) =>
        acc.withColumn(out, col(s"__p_$out") + col(s"__l_$out"))
          .drop(s"__p_$out", s"__l_$out")
    }
    lifted.drop(b)
  }

  /** GROUPED variant of [[withRunningSums]]: the running sums restart
    * per `groups` key, but — unlike a per-group global window, whose
    * partitions grow with the group's share of the data — each
    * (group, bucket) cell sorts locally and cross-bucket lifts come
    * from a |groups|·|buckets|-row triangular broadcast join. Cut
    * points stay GLOBAL on `key` (order-preserving within every group
    * regardless of where the cuts fall; group skew only unbalances
    * cells, never changes a sum — the [[withRank]] exactness argument
    * verbatim). This is the primitive behind grouped exact quantiles
    * and trimmed aggregates (q313/q314).
    *
    * PRECONDITION: `groups` columns must be NON-NULL — both the
    * triangular prefix join and the final lift join use null-rejecting
    * equality, so a null-keyed row would silently vanish from the
    * output. Callers with nullable group keys must coalesce to a
    * sentinel first (every current caller groups on non-null fixture
    * columns). */
  def withGroupedRunningSums(df: DataFrame, groups: Seq[String],
      key: String, tie: String, sums: Seq[(String, String)],
      nBuckets: Int = 16): DataFrame = {
    require(nBuckets > 1, "nBuckets must exceed 1")
    require(sums.nonEmpty, "at least one (value, outName) pair")
    require(groups.nonEmpty, "use withRunningSums for the ungrouped form")
    val b = s"__b_${sums.head._2}"
    val probs = typedlit((1 until nBuckets).map(_.toDouble / nBuckets))
    val cuts = df.agg(
      percentile_approx(col(key), probs, lit(10000)).as("__cuts"))
      .localCheckpoint()
    val bucketed = df.crossJoin(broadcast(cuts))
      .withColumn(b,
        expr(s"aggregate(__cuts, 0, (a, c) -> a + IF($key > c, 1, 0))"))
      .drop("__cuts")
      .repartition((groups :+ b).map(col): _*)
    val w = Window.partitionBy((groups :+ b).map(col): _*)
      .orderBy(col(key).asc, col(tie).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(bucketed) { case (acc, (v, out)) =>
      acc.withColumn(s"__l_$out", sum(col(v)).over(w))
    }
    val btot = bucketed.groupBy((groups :+ b).map(col): _*)
      .agg(sums.map { case (v, out) => sum(col(v)).as(s"__t_$out") }.head,
        sums.tail.map { case (v, out) => sum(col(v)).as(s"__t_$out") }: _*)
    val earlier = btot.select(
      (groups.map(g => col(g).as(s"__og_$g")) :+ col(b).as("__ob")) ++
        sums.map { case (_, out) => col(s"__t_$out").as(s"__e_$out") }: _*)
    val joinCond = groups.map(g => col(s"__og_$g") === col(g))
      .reduce(_ && _) && col("__ob") < col(b)
    val prefixes = btot.join(broadcast(earlier), joinCond, "left")
      .groupBy((groups :+ b).map(col): _*)
      .agg(sums.map { case (_, out) =>
          coalesce(sum(col(s"__e_$out")), lit(0L)).as(s"__p_$out") }.head,
        sums.tail.map { case (_, out) =>
          coalesce(sum(col(s"__e_$out")), lit(0L)).as(s"__p_$out") }: _*)
    val lifted = sums.foldLeft(
        local.join(broadcast(prefixes), groups :+ b)) {
      case (acc, (_, out)) =>
        acc.withColumn(out, col(s"__p_$out") + col(s"__l_$out"))
          .drop(s"__p_$out", s"__l_$out")
    }
    lifted.drop(b)
  }
}
