package graft.core

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Tracker for TRANSIENT caches — frames an operator persists for the
  * duration of one query (shingle posting lists, banded signatures,
  * split sides) as opposed to session [[Artifacts]].
  *
  * Operators route short-lived `.cache()` calls through [[transient]];
  * a harness then releases exactly these between queries with
  * [[releaseTransients]] instead of `spark.catalog.clearCache()`, which
  * cannot tell a per-query working set from a compute-once artifact.
  * (Within a query the cache is still load-bearing — consumers branch
  * over the frame several times — so operators cannot simply unpersist
  * before returning their lazy result.)
  */
object Caches {

  private val transients = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Cache `ds` and track it for the next [[releaseTransients]]. */
  def transient[T](ds: Dataset[T]): Dataset[T] = {
    transients.add(ds)
    ds.cache()
  }

  /** Unpersist every tracked transient frame (non-blocking) and clear
    * the tracking list. Safe to call at any query boundary; artifacts
    * registered via [[Artifacts.memo]] are untouched. */
  def releaseTransients(): Unit = {
    var ds = transients.poll()
    while (ds != null) {
      try ds.unpersist(false)
      catch { case _: Throwable => () }
      ds = transients.poll()
    }
  }
}
