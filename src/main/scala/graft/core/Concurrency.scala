package graft.core

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Run independent Spark-job legs as concurrent jobs (the guide §2.6
  * overlap pattern) on a FRESH per-call executor, never the global pool.
  *
  * Why not `ExecutionContext.Implicits.global`: Spark's job group (and
  * every other localProperty) is an InheritableThreadLocal, copied ONLY
  * at thread creation. Global-pool threads are created lazily and reused
  * across callers, so jobs submitted from them carry a stale or absent
  * job group — a harness that cancels the caller's job group (Bench's
  * per-sample watchdog) then cannot reach the concurrent legs, and a
  * cancelled sample's legs keep running and mutating scratch state
  * underneath the next sample. A pool created HERE spins its worker
  * threads from the submitting thread (ThreadPoolExecutor.addWorker runs
  * in the submitter), so each leg inherits the caller's job group and
  * cancellation reaches every leg.
  *
  * The pool is shut down in a finally: on success all legs have
  * completed (shutdownNow interrupts nothing); on failure the interrupt
  * unwinds the still-running legs instead of leaking them. */
object Concurrency {

  def runAll[T](legs: Seq[() => T]): Seq[T] = runAll(legs, legs.size)

  /** [[runAll]] with a thread cap — for fan-outs whose leg count scales
    * with a layout parameter (bucket/band/list dirs in a filesystem
    * copy) rather than a small fixed family count. */
  def runAll[T](legs: Seq[() => T], maxThreads: Int): Seq[T] = {
    require(legs.nonEmpty, "runAll needs at least one leg")
    require(maxThreads >= 1, s"maxThreads must be >= 1, got $maxThreads")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(legs.size, maxThreads))
    try {
      val ec = ExecutionContext.fromExecutorService(pool)
      val futures = legs.map(l => Future(l())(ec))
      futures.map(Await.result(_, Duration.Inf))
    } finally pool.shutdownNow()
  }

  /** Two-leg convenience with distinct result types. */
  def both[A, B](a: () => A, b: () => B): (A, B) = {
    val r = runAll(Seq(() => a(): Any, () => b(): Any))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }
}
