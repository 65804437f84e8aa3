package graft.core

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-side overlap of INDEPENDENT Spark actions (the guide's
  * "overlap independent jobs" pattern): Spark's scheduler happily runs
  * several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially. The index
  * writers emit 2-3 independent table writes per segment/compaction;
  * running them from a small pool lets the next write's tasks
  * back-fill executor slots freed by the previous write's tail (and
  * overlaps their driver-side planning/commit, which dominates for
  * small tables). Failures propagate: the first failed action's
  * exception is rethrown after all complete or fail.
  */
object Par {

  // bounded, daemon, shared: 2-3 in flight is the useful range — enough
  // to fill a tail, not enough to fight for executor slots
  private lazy val pool = ExecutionContext.fromExecutorService(
    Executors.newFixedThreadPool(4, r => {
      val t = new Thread(r, "graft-par-action")
      t.setDaemon(true)
      t
    }))

  /** Run the given thunks concurrently; block until ALL finish; rethrow
    * the first failure (after every thunk has completed or failed, so a
    * failing write never leaves a sibling running against a torn tree).
    */
  def awaitAll(bodies: (() => Unit)*): Unit = {
    if (bodies.sizeIs <= 1) { bodies.foreach(_.apply()); return }
    // propagate the caller's active session: thread-locals don't cross
    // into pool threads, and session-dependent code (SQLConf.get in
    // schema conversion, implicits) must see the same session there
    val active = org.apache.spark.sql.SparkSession.getActiveSession
    val futures = bodies.map(b => Future {
      active.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      b()
    }(pool))
    val results = futures.map(f =>
      Await.ready(f, Duration.Inf).value.get)
    results.collectFirst { case scala.util.Failure(e) => throw e }
    ()
  }
}
