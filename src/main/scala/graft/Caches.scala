package graft

import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList}

import org.apache.spark.sql.SparkSession

/** Session-lifecycle hygiene for the JVM-global plan caches.
  *
  * [[Tables]], [[Artifacts]] and [[Graft]] memoize analyzed DataFrames
  * keyed on the OWNING [[SparkSession]] instance — correct (a stopped
  * session's plans must never serve a new one) but, uncollected, a
  * leak: a DataFrame strongly references its session, so a long-lived
  * JVM that builds and stops many sessions (every test suite; a
  * notebook service recycling per-tenant sessions) pins every dead
  * session's whole plan graph for the process lifetime. Weak-keyed
  * maps don't help — the VALUE (the DataFrame) references the key (its
  * session), defeating weak-reference collection by construction — so
  * the caches register a sweeper here instead, and [[sweep]] drops
  * every entry whose owning session's SparkContext has stopped.
  *
  * Sweeps run at the natural boundaries where cache content changes
  * anyway: session construction ([[Session.build]]) and every cache
  * MISS (the hit path stays O(1)). The maps hold at most a few hundred
  * entries — one stat-free `isStopped` check each — so a sweep is
  * microseconds against the plan build it precedes.
  */
object Caches {

  private final case class Registrant(
      doSweep: () => Unit, countFor: SparkSession => Int)

  private val registrants = new CopyOnWriteArrayList[Registrant]()

  /** Register a session-keyed cache map; `owner` extracts the owning
    * session from a key. Called once per cache at class init. */
  private[graft] def registerMap[K <: AnyRef, V](m: ConcurrentHashMap[K, V])(
      owner: K => SparkSession): Unit =
    registrants.add(Registrant(
      () => {
        val it = m.keySet().iterator()
        while (it.hasNext) {
          val k = it.next()
          if (owner(k).sparkContext.isStopped) it.remove()
        }
      },
      s => {
        var n = 0
        val it = m.keySet().iterator()
        while (it.hasNext) if (owner(it.next()) eq s) n += 1
        n
      }))

  /** Drop every cached plan owned by a stopped session, in all
    * registered caches. */
  def sweep(): Unit = registrants.forEach(_.doSweep())

  /** Entries owned by `s` across all registered caches (test
    * observability — CacheHygieneSpec pins stop ⇒ sweep ⇒ 0). */
  private[graft] def entriesFor(s: SparkSession): Int = {
    var n = 0
    registrants.forEach(r => n += r.countFor(s))
    n
  }
}
