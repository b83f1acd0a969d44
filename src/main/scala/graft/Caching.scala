package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** Cache-ownership contract for operator intermediates.
  *
  * Several operators persist frames that are read more than once inside
  * their own plan (LSH buckets, normalized embeddings, iterative labeler
  * state). Those persists are part of the operator's cost model — but a
  * library user composing many operators in one long-lived session would
  * otherwise accumulate cached frames silently (Spark only evicts under
  * memory pressure, LRU).
  *
  * Contract:
  *  - By default the CALLER owns the cache: operators persist through
  *    [[Caching.persist]] and never unpersist, so the frames a returned
  *    (lazy) plan references stay warm until the caller decides —
  *    `spark.catalog.clearCache()` or session end. This is what the
  *    bench harness does between entries.
  *  - A caller can OPT IN to scoped ownership: `Caching.scoped { ...run
  *    operators AND materialize their results... }` unpersists every
  *    frame the enclosed operators persisted, on scope exit (even on
  *    failure). Materialize inside the scope — results consumed after
  *    exit recompute from source (correct, just uncached).
  *
  * Scopes are thread-local and nest; each persist registers with the
  * innermost open scope on its thread. Work handed to OTHER threads
  * (a Future pool, a streaming foreachBatch worker) does not see the
  * calling thread's scope by default — a pool thread may predate the
  * scope, so JVM-level inheritance cannot be relied on either. Code
  * that fans out under a scope must carry it explicitly:
  * [[captureScope]] on the submitting thread, [[runWithScope]] around
  * the worker body (ModelEngine's level-parallel `run` does exactly
  * this, so `Caching.scoped { engine.run(...) }` releases every frame
  * the models persisted on any pool thread).
  */
object Caching {

  private val scopes = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[ArrayBuffer[DataFrame]] = Nil
  }

  /** Opaque snapshot of a thread's open scope stack, for re-establishing
    * it on a worker thread ([[captureScope]] / [[runWithScope]]).
    */
  final class ScopeHandle private[Caching] (
      private[Caching] val stack: List[ArrayBuffer[DataFrame]])

  /** Snapshot the calling thread's open scopes (empty handle if none). */
  def captureScope: ScopeHandle = new ScopeHandle(scopes.get())

  /** Run `body` with `handle`'s scopes installed on the current thread
    * (restoring the thread's own stack after): persists inside `body`
    * register with the capturing thread's innermost scope.
    */
  def runWithScope[T](handle: ScopeHandle)(body: => T): T = {
    val prev = scopes.get()
    scopes.set(handle.stack)
    try body finally scopes.set(prev)
  }

  /** Persist `df` (MEMORY_AND_DISK by default) and register it with the
    * innermost open [[scoped]] block on this thread, if any.
    */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    scopes.get() match {
      case buf :: _ => buf.synchronized { buf += df } // scope may span threads
      case Nil      => // no scope open: caller owns the cache
    }
    df
  }

  /** Run `body`; afterwards unpersist (non-blocking) every frame the
    * enclosed operators persisted via [[persist]] on this thread.
    */
  def scoped[T](body: => T): T = {
    val buf = ArrayBuffer.empty[DataFrame]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.synchronized(buf.toList).foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () } // session already stopped, etc.
      }
    }
  }

  /** Chained-style syntax: `df.persistTracked` ==
    * `Caching.persist(df)`.
    */
  implicit final class PersistSyntax(private val df: DataFrame) extends AnyVal {
    def persistTracked: DataFrame = Caching.persist(df)
  }
}
