package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Scratch

/** The harness-side scratch-release contract: inside a scope, tracked
  * persists and localCheckpoints free their blocks when the scope
  * closes; outside a scope, track is a no-op and the caller keeps the
  * frame's lifetime.
  */
class ScratchSpec extends AnyFunSuite {
  import SparkTestSession._

  test("scoped releases tracked persists and checkpoint RDDs") {
    import spark.implicits._
    var persisted: org.apache.spark.sql.DataFrame = null
    var checkpointed: org.apache.spark.sql.DataFrame = null
    val result = Scratch.scoped {
      persisted = Scratch.track(
        (1 to 100).toDF("x").persist())
      checkpointed = Scratch.track(
        (1 to 100).toDF("x").localCheckpoint())
      // both live inside the scope: the persist is marked, the
      // checkpoint's backing RDD holds its blocks
      assert(persisted.storageLevel != StorageLevel.NONE)
      persisted.count() + checkpointed.count()
    }
    assert(result == 200L)
    assert(persisted.storageLevel == StorageLevel.NONE,
      "tracked persist survived its scope")
    val backing = checkpointed.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.get
    assert(backing.getStorageLevel == StorageLevel.NONE,
      "tracked checkpoint RDD survived its scope")
  }

  test("track without a scope is a no-op; nested scopes are isolated") {
    import spark.implicits._
    // distinct data per frame: Spark's CacheManager dedups cache
    // entries by plan, so identical frames would share one entry and
    // fake a cross-release
    val free = Scratch.track((1 to 7).toDF("x").persist())
    assert(free.storageLevel != StorageLevel.NONE,
      "track outside any scope must not schedule a release")
    free.unpersist()
    // outer-scope frames survive an inner scope's cleanup
    Scratch.scoped {
      val outer = Scratch.track((8 to 19).toDF("x").persist())
      Scratch.scoped {
        Scratch.track((20 to 31).toDF("y").persist()).count()
      }
      assert(outer.storageLevel != StorageLevel.NONE,
        "inner scope released an outer scope's frame")
    }
  }

  test("bench heavy path leaves no cached scratch behind its scope") {
    // the round-10 heavy neighbor: bowNearDups persists a shard table
    // and checkpoints the hashed-embedding vectors; inside a harness
    // scope both must be gone when the query's run ends
    val docs = Tables(spark, Sf0001).documents
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Scratch.scoped {
      assert(graft.ext.Dedup.bowNearDups(docs).count() > 0)
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"bowNearDups left ${leaked.size} cached RDDs after its scope")
  }
}
