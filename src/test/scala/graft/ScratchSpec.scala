package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Scratch

/** The harness-side scratch-release contract: inside a scope, tracked
  * localCheckpoints free their backing blocks when the scope closes
  * (nothing can ever plan-match a checkpoint's fresh RDD leaf, so
  * those blocks are pure dead weight), and so do tracked persists
  * DERIVED from one of those released checkpoints (same zero reuse
  * value — the unique leaf plan-matches nothing — plus a recompute
  * hazard: truncated lineage over gone blocks); tracked plain persists
  * with replayable lineage stay cached on purpose — Spark's
  * CacheManager plan-matches identical fragments across sibling
  * queries, and releasing them was measured (round-11 A/B) to cost the
  * suite ~10 s of legitimate reuse. Outside a scope, track is a no-op.
  */
class ScratchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("scoped releases tracked checkpoints, keeps tracked persists") {
    import spark.implicits._
    var persisted: org.apache.spark.sql.DataFrame = null
    var checkpointed: org.apache.spark.sql.DataFrame = null
    val result = Scratch.scoped {
      persisted = Scratch.track(
        (100 to 199).toDF("x").persist())
      checkpointed = Scratch.track(
        (200 to 299).toDF("x").localCheckpoint())
      assert(persisted.storageLevel != StorageLevel.NONE)
      persisted.count() + checkpointed.count()
    }
    assert(result == 200L)
    // the checkpoint's backing RDD is released with the scope...
    val backing = checkpointed.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.get
    assert(backing.getStorageLevel == StorageLevel.NONE,
      "tracked checkpoint RDD survived its scope")
    // ...while the plain persist stays cached for plan-matched reuse
    assert(persisted.storageLevel != StorageLevel.NONE,
      "tracked plain persist must stay cached (reuse beats release)")
    persisted.unpersist()
  }

  test("track without a scope is a no-op; nested scopes are isolated") {
    import spark.implicits._
    // distinct data per frame: Spark's CacheManager dedups cache
    // entries by plan, so identical frames would share one entry and
    // fake a cross-release
    val free = Scratch.track((1 to 7).toDF("x").localCheckpoint())
    def backingLevel(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectFirst {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.get.getStorageLevel
    assert(backingLevel(free) != StorageLevel.NONE,
      "track outside any scope must not schedule a release")
    // outer-scope frames survive an inner scope's cleanup
    Scratch.scoped {
      val outer = Scratch.track((8 to 19).toDF("x").localCheckpoint())
      Scratch.scoped {
        Scratch.track((20 to 31).toDF("y").localCheckpoint()).count()
      }
      assert(backingLevel(outer) != StorageLevel.NONE,
        "inner scope released an outer scope's frame")
    }
  }

  test("checkpoint-derived persists are released with their checkpoint") {
    import spark.implicits._
    var ckpt: org.apache.spark.sql.DataFrame = null
    var derived: org.apache.spark.sql.DataFrame = null
    var clean: org.apache.spark.sql.DataFrame = null
    Scratch.scoped {
      ckpt = Scratch.track((300 to 399).toDF("x").localCheckpoint())
      // derives from the ABOUT-TO-BE-RELEASED checkpoint: with the
      // checkpoint's blocks gone its truncated lineage can never be
      // recomputed, and its unique LogicalRDD leaf plan-matches
      // nothing — keeping it cached would be dead weight with a
      // recompute-failure hazard (the round-11 ADVICE finding on
      // bowNearDups' shard persist)
      derived = Scratch.track(
        ckpt.filter(col("x") % 2 === 0).persist())
      // replayable lineage, no checkpoint leaf: stays cached
      clean = Scratch.track((400 to 499).toDF("x").persist())
      assert(derived.count() == 50 && clean.count() == 100)
    }
    assert(derived.storageLevel == StorageLevel.NONE,
      "persist derived from a released checkpoint must be released too")
    assert(clean.storageLevel != StorageLevel.NONE,
      "plain persist must stay cached (reuse beats release)")
    clean.unpersist()
    // a persist over an UNTRACKED (someone else's, still-live)
    // checkpoint is untouched — its leaf is not in the released set
    val foreign = (500 to 599).toDF("x").localCheckpoint()
    val over = Scratch.scoped {
      Scratch.track(foreign.filter(col("x") > 550).persist())
    }
    assert(over.storageLevel != StorageLevel.NONE,
      "persist over a live foreign checkpoint must stay cached")
    over.unpersist(); foreign.unpersist()
  }

  test("bench heavy path leaves no checkpoint blocks behind its scope") {
    // the round-10 heavy neighbor: bowNearDups checkpoints the hashed
    // embedding vectors (the big dead-weight block); inside a harness
    // scope it must be gone when the query's run ends, along with the
    // shard persist derived from it (round-11 ADVICE)
    val docs = Tables(spark, Sf0001).documents
    // diff against a before-snapshot: the shared test session carries
    // other suites' (legitimately unscoped) leftovers
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Scratch.scoped {
      assert(graft.ext.Dedup.bowNearDups(docs).count() > 0)
    }
    // a CHECKPOINT RDD's own creation site is the localCheckpoint call
    val leakedCheckpoints =
      (spark.sparkContext.getPersistentRDDs -- before).values
        .filter(_.toDebugString.linesIterator.next()
          .contains("localCheckpoint"))
    assert(leakedCheckpoints.isEmpty,
      s"bowNearDups left ${leakedCheckpoints.size} checkpointed RDDs " +
        "after its scope")
  }
}
