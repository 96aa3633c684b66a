package graft.ext

import org.apache.spark.sql.Dataset

/** Thread-scoped tracking of per-query scratch frames — persisted or
  * `localCheckpoint`ed intermediates whose cached blocks are only
  * needed while their own query materializes.
  *
  * Why: a 150+-query harness run executes queries back to back in one
  * JVM, and every operator-internal `persist()`/`localCheckpoint()`
  * that outlives its action accretes executor storage memory; later
  * queries then pay the evicted-cache / GC bill of their heavier
  * alphabetical neighbors (the round-9/10 heavy-neighbor bench
  * artifact). The harness-global alternative — clearCache + GC around
  * every query — was measured 22% WORSE for the median query, because
  * it also drops the deliberate cross-query state (disk-backed indexes
  * are unaffected, but heap re-growth and lost page cache are not).
  * So cleanup is the HEAVY QUERY'S OWN JOB: operators register their
  * scratch frames with [[track]], and the harness wraps each query in
  * [[scoped]], releasing exactly that query's leftovers after its
  * timing/write completes.
  *
  * Without an active scope (library use, streaming, specs) [[track]]
  * is a no-op — callers outside a harness keep full control of frame
  * lifetimes. Registration happens at plan-construction time on the
  * scope's thread, which is also where `persist`/`localCheckpoint`
  * calls live, so concurrent harness threads (Verify's bounded pool)
  * never release each other's frames.
  *
  * At 100 TB the same discipline matters more, not less: an executor
  * fleet serving a query mix cannot afford N queries' worth of dead
  * cached partitions, and "who releases this" must be answerable per
  * frame — here the answer is always "the query that made it".
  */
object Scratch {

  private val tl = new ThreadLocal[java.util.ArrayDeque[Dataset[_]]]()

  /** Register a persisted/checkpointed scratch frame for release when
    * the enclosing [[scoped]] block ends. Returns the frame, so call
    * sites read `Scratch.track(df.persist())`. No-op without a scope.
    * Do NOT track frames cached for cross-query reuse (model caches,
    * [[IndexCache]]-built artifacts) — those are serving state, not
    * scratch.
    */
  def track[T <: Dataset[_]](df: T): T = {
    val buf = tl.get()
    if (buf != null) buf.push(df)
    df
  }

  /** Best-effort release: unpersist the frame's own cached plan and,
    * when it is a localCheckpoint (a LogicalRDD leaf), the backing
    * RDD's blocks (Dataset.unpersist alone does not reach those).
    */
  private def release(df: Dataset[_]): Unit =
    try {
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(blocking = false))
      df.unpersist(blocking = false)
      ()
    } catch { case _: Throwable => () }

  /** Run `body` with a fresh tracking scope; release every frame the
    * body tracked once it returns (or throws). Scopes nest — an inner
    * scope restores the outer one.
    */
  def scoped[T](body: => T): T = {
    val outer = tl.get()
    val buf = new java.util.ArrayDeque[Dataset[_]]()
    tl.set(buf)
    try body
    finally {
      tl.set(outer)
      buf.forEach(release(_))
    }
  }
}
