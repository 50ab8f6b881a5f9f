package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped DataFrame memo with eviction (ADVICE r2: the per-module
  * ConcurrentHashMap memos and per-invocation `.cache()`s were never
  * unpersisted, so a long-lived JVM that recycles sessions accumulated
  * stale cached plans and storage).
  *
  * One `.cache()`d frame per (session, key), shared by every registry
  * query that needs it; when the owning session's SparkContext stops, all
  * of that session's entries are unpersisted and dropped. Within a live
  * session the entry count is bounded by the distinct keys the engine
  * uses (one per memoized stage × SF dir).
  */
object Memo {

  private val entries = new ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked = new ConcurrentHashMap[SparkSession, SparkListener]()

  /** Get-or-build the cached frame for (s, key). `build` runs at most once
    * per live (session, key); the result is `.cache()`d. Every call also
    * lazily sweeps entries whose context has since stopped (ADVICE r3: the
    * ApplicationEnd listener alone never fires for a session retired while
    * the shared context lives on — stopped-context entries would pin
    * DataFrames and SparkSessions until application end). */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    sweepStopped()
    if (!hooked.containsKey(s)) {
      val listener = new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = drop(s)
      }
      if (hooked.putIfAbsent(s, listener) == null) {
        s.sparkContext.addSparkListener(listener)
      }
    }
    // get-then-putIfAbsent, NOT computeIfAbsent: builds are memoized
    // COMPOSITIONS (clusters → jaccard pairs → shingle frame), so `build`
    // re-enters cached() — reentrant computeIfAbsent on one map is
    // undefined behavior and was silently losing entries. The benign race
    // (two threads building the same key once) just unpersists the loser.
    val k = (s, key)
    val existing = entries.get(k)
    if (existing != null) existing
    else {
      if (sys.env.contains("GRAFT_MEMO_DEBUG")) println(s"MEMO MISS $key")
      val built = build.cache()
      val prev = entries.putIfAbsent(k, built)
      if (prev != null) { built.unpersist(blocking = false); prev }
      else built
    }
  }

  /** Drop every entry whose owning context is stopped. Entry count is
    * bounded (one per memoized stage × SF dir), so the scan is cheap. */
  private def sweepStopped(): Unit = {
    val it = entries.keySet().iterator()
    val dead = scala.collection.mutable.Set.empty[SparkSession]
    while (it.hasNext) {
      val owner = it.next()._1
      if (owner.sparkContext.isStopped) dead += owner
    }
    dead.foreach(drop)
  }

  /** Unpersist and forget every entry owned by `s` (idempotent; also
    * invoked automatically when the session's context stops). The
    * session's listener is removed from the shared bus too — otherwise a
    * long-lived context accumulates one closure (pinning its retired
    * SparkSession) per session ever memoized. */
  def drop(s: SparkSession): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        try e.getValue.unpersist(blocking = false)
        catch { case _: Throwable => () } // context may already be down
        it.remove()
      }
    }
    val listener = hooked.remove(s)
    if (listener != null) {
      try s.sparkContext.removeSparkListener(listener)
      catch { case _: Throwable => () } // context may already be down
    }
  }

  /** Visible for tests. */
  private[graft] def size: Int = entries.size()
}
