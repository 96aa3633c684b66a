package graft.ext

/** Per-JVM memoization of persisted-index builds ("index once, serve
  * many"). A deployment builds the postings/IVF index in its ingest job
  * and every query after that only READS it — rebuilding per query
  * call is a harness artifact, not the production plan. `ensure` runs
  * `build` at most once per (JVM, path): the first caller builds (and
  * the writers' overwrite mode refreshes any stale on-disk state from a
  * previous process), concurrent callers block on the same key, and
  * later callers return immediately. A failed build is NOT memoized —
  * it is removed so the next caller retries, and blocked waiters of the
  * failed attempt rethrow.
  *
  * The build runs OUTSIDE the map operation (latch handoff, not
  * `computeIfAbsent(build)`): an index build may itself `ensure` a
  * prerequisite index (cluster labels build on the band index), and
  * ConcurrentHashMap forbids reentrant updates — whether a nested
  * computeIfAbsent throws `Recursive update` depends on which hash bins
  * the two keys land in, which made the old form fail only for specific
  * path strings.
  */
object IndexCache {
  private final class Entry {
    val latch = new java.util.concurrent.CountDownLatch(1)
    @volatile var error: Throwable = null
  }

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  @annotation.tailrec
  def ensure(path: String)(build: => Unit): Unit = {
    val fresh = new Entry
    val prior = built.putIfAbsent(path, fresh)
    if (prior == null) {
      try build
      catch {
        case t: Throwable =>
          fresh.error = t
          built.remove(path, fresh)
          fresh.latch.countDown()
          throw t
      }
      fresh.latch.countDown()
    } else {
      prior.latch.await()
      if (prior.error != null) ensure(path)(build) // failed attempt: retry
    }
  }
}
