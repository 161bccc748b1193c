package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import scala.collection.mutable.ArrayBuffer

/** Session cache hygiene: the engine-side half of the reference's job
  * lifecycle, where `closeJobHandle` frees every intermediate the job
  * pinned (`MapReduceFramework.cpp:355-384`). Operators that persist or
  * locally checkpoint an intermediate register a release thunk here;
  * the harness (Bench, Verify, the lifecycle spec — any caller that owns
  * a query's consume step) invokes [[releaseAll]] once the query's
  * actions have completed. Without this, a long-lived session running
  * many queries accumulates storage blocks until evictions thrash —
  * exactly the round-4 driver-bench pathology where leaked caches taxed
  * unrelated queries.
  *
  * Release happens *after* consumption, so registering never costs a
  * recompute; an unreleased registration (e.g. a unit test that builds a
  * query without the harness) degrades to the previous behavior of
  * ContextCleaner reclaim on GC. Double-release is a no-op.
  */
object Caches {
  private val pending = ArrayBuffer[() => Unit]()

  /** Persist `df` and register it for release at the next [[releaseAll]]. */
  def persisted(df: DataFrame): DataFrame = synchronized {
    df.persist()
    pending += (() => df.unpersist(false))
    df
  }

  /** Register an already-persisted frame for release (loop-carried caches
    * whose persist call sites the caller manages itself).
    */
  def register(df: DataFrame): DataFrame = synchronized {
    pending += (() => df.unpersist(false))
    df
  }

  /** Lazily local-checkpoint `df` and register its checkpoint blocks for
    * release. `Dataset.unpersist` cannot reach a local checkpoint (it is
    * RDD-level storage, not CacheManager state), so the thunk unpersists
    * the underlying `LogicalRDD`'s RDD directly. A released checkpoint
    * cannot be recomputed (lineage is truncated by design), so the
    * returned frame must be fully consumed before [[releaseAll]] — the
    * harness contract above.
    */
  def checkpointed(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(false)
    synchronized {
      pending += { () =>
        out.queryExecution.analyzed match {
          case l: LogicalRDD => l.rdd.unpersist(false)
          case _             => ()
        }
      }
    }
    out
  }

  /** Register an arbitrary release action (e.g. destroying an explicit
    * broadcast variable) for the next [[releaseAll]].
    */
  def defer(release: () => Unit): Unit = synchronized {
    pending += release
  }

  /** Release everything registered since the last call. Called by the
    * harness after each query's actions complete.
    */
  def releaseAll(): Unit = synchronized {
    pending.foreach(f => try f() catch { case _: Throwable => () })
    pending.clear()
  }
}
