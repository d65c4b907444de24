package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.QueryExecution

/** Capture point for the STREAMING plan sweep: every streaming start
  * site in the library routes its frame through [[record]] immediately
  * before `.writeStream`, so a test can arm the probe, run a streaming
  * query end-to-end, and assert scale rules (no unhinted cross joins,
  * no unpartitioned data-scale windows) on the ANALYZED logical plan of
  * every stream the query started — the streaming counterpart of
  * PlanAssertionsSpec's batch sweeps, which can inspect batch plans
  * without this hook because batch constructors return lazy frames.
  * Streaming constructors drain internally (the returned frame is the
  * already-executed result), so the pre-start plan is only observable
  * here.
  *
  * Disarmed (the default, and always in production use) the probe is a
  * single volatile read per streaming start — zero cost, zero state. */
object PlanProbe {
  @volatile private var armed = false
  private val captured =
    new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()

  /** Identity on the frame; stashes its QueryExecution when armed
    * (the sweep pulls `analyzed`/`optimizedPlan` lazily — nothing is
    * computed here). */
  def record[T](df: Dataset[T]): Dataset[T] = {
    if (armed) captured.add(df.queryExecution)
    df
  }

  /** Start capturing (clears any previous capture). Test-only. */
  def arm(): Unit = { captured.clear(); armed = true }

  /** Stop capturing and return everything recorded since [[arm]]. */
  def disarm(): Seq[QueryExecution] = {
    armed = false
    val out = Seq.newBuilder[QueryExecution]
    var p = captured.poll()
    while (p != null) { out += p; p = captured.poll() }
    out.result()
  }
}
