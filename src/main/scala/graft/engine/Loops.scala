package graft.engine

import org.apache.spark.sql.DataFrame

/** Lineage cutting for ITERATIVE queries (connected components, BFS
  * frontiers, k-means, label propagation, power iteration): each round
  * re-derives a frame from the previous round's, and without a cut the
  * logical plan doubles per iteration — analysis cost grows, and a
  * lost executor must recompute the whole chain.
  *
  * The MECHANISM is conf-switched because the right cut differs by
  * deployment:
  *
  *   - `local` (default, the sandbox posture): `localCheckpoint()` —
  *     blocks live on executor local storage, cheap, but NOT
  *     fault-tolerant (a lost executor loses its blocks and the
  *     lineage needed to rebuild them was just cut).
  *   - `reliable` (the cluster posture): RDD `checkpoint()` to the
  *     SparkContext checkpoint directory — on a real cluster that is
  *     HDFS/S3, surviving executor loss, which is the only safe cut
  *     for a 1000-executor iterative job where losing one of 16
  *     rounds' blocks would otherwise restart the whole loop.
  *
  * Every loop in the library cuts through here (LoopsSpec proves the
  * conf actually flips the physical mechanism and PLANS.md cites the
  * sites), so flipping ONE conf moves every iterative query between
  * postures — no per-query edits.
  */
object Loops {
  /** `local` (localCheckpoint) or `reliable` (checkpoint to the
    * SparkContext checkpoint dir). */
  val ConfKey = "spark.graft.loops.cut"

  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ConfKey, "local") match {
      case "local" => df.localCheckpoint()
      case "reliable" =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          // Sandbox stand-in for the cluster's durable FS: a temp dir
          // reclaimed at JVM exit. A real deployment sets the
          // checkpoint dir to HDFS/S3 at session build and this branch
          // never runs.
          val dir = TempIo.createTempDir("graft-reliable-ckpt-")
          TempIo.deleteAtExit(dir)
          sc.setCheckpointDir(dir)
        }
        df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be 'local' or 'reliable', got '$other'")
    }
}
