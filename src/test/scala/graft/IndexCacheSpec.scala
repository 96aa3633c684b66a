package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.IndexCache

class IndexCacheSpec extends AnyFunSuite {

  test("ensure runs a build at most once per path") {
    val n = new AtomicInteger(0)
    val p = s"/tmp/idxcache_spec_once_${System.nanoTime()}"
    IndexCache.ensure(p) { n.incrementAndGet(); () }
    IndexCache.ensure(p) { n.incrementAndGet(); () }
    assert(n.get() == 1)
  }

  test("nested ensure (an index building on a prerequisite index) works") {
    // the cluster-labels index builds on the band index: ensure-inside-
    // ensure must not hit ConcurrentHashMap's reentrant-update guard,
    // whatever hash bins the two paths land in
    val n = new AtomicInteger(0)
    val t = System.nanoTime()
    for (i <- 0 until 64) { // many key pairs -> many bin layouts
      IndexCache.ensure(s"/tmp/idxcache_spec_outer_${t}_$i") {
        IndexCache.ensure(s"/tmp/idxcache_spec_inner_${t}_$i") {
          n.incrementAndGet(); ()
        }
      }
    }
    assert(n.get() == 64)
  }

  test("a failed build is not memoized; the next caller retries") {
    val n = new AtomicInteger(0)
    val p = s"/tmp/idxcache_spec_fail_${System.nanoTime()}"
    intercept[RuntimeException] {
      IndexCache.ensure(p) { n.incrementAndGet(); throw new RuntimeException("boom") }
    }
    IndexCache.ensure(p) { n.incrementAndGet(); () }
    assert(n.get() == 2)
  }

  test("concurrent callers of one path block and see a single build") {
    val n = new AtomicInteger(0)
    val p = s"/tmp/idxcache_spec_conc_${System.nanoTime()}"
    val threads = (0 until 8).map { _ =>
      new Thread(() => IndexCache.ensure(p) {
        Thread.sleep(50); n.incrementAndGet(); ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(n.get() == 1)
  }
}
