package graft

/** Per-key double-checked memoization for the `_build` memos
  * (CurationRound.memoized, Unigram.fitMemo): the map's bin lock is
  * held only long enough to INSTALL a lazy holder, and the build runs
  * under the holder's own lazy-val lock — so two concurrent first
  * callers for DIFFERENT keys (say two corpora curated side by side)
  * build in parallel, while two callers racing on the SAME key still
  * build exactly once. A build that throws leaves the holder
  * unforced; the next caller for that key retries (lazy-val
  * semantics), matching the previous global-lock behavior.
  */
private[graft] final class KeyedMemo[K, V] {
  private final class Holder(thunk: () => V) { lazy val value: V = thunk() }
  private val m = new java.util.concurrent.ConcurrentHashMap[K, Holder]()

  /** The memoized value for `key`, building (once per key) on demand. */
  def getOrBuild(key: K)(build: => V): V =
    m.computeIfAbsent(key, _ => new Holder(() => build)).value

  /** Drop every entry whose key matches `p` (pass-boundary hook). A
    * caller mid-build keeps its holder — the entry just stops being
    * served to new callers. */
  def invalidateIf(p: K => Boolean): Unit = {
    val it = m.keySet.iterator()
    while (it.hasNext) if (p(it.next())) it.remove()
  }
}
