package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Compaction

/** Small-file compaction: plan flags only fragmented partitions, the
  * rewrite bin-packs them without changing content, and repeated runs
  * are no-ops (IO proportional to fragmentation, not table size).
  */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("compact bin-packs fragmented partitions and preserves content") {
    val dir = Files.createTempDirectory("compact").toString + "/tbl"
    val ev = Tables(spark, Sf0001).events
      .select("event_id", "user_id", "event_type")
    // 8-way repartition → up to 8 fragment files per partition value
    ev.repartition(8).write.partitionBy("event_type").parquet(dir)
    val target = 512L * 1024 * 1024

    val plan0 = Compaction.plan(spark, dir, target).collect()
    assert(plan0.length == 5)
    assert(plan0.forall(_.getAs[Long]("n_files") > 1))
    assert(plan0.forall(_.getAs[Boolean]("needs_compaction")))

    val nRows = spark.read.parquet(dir).count()
    val checksum = spark.read.parquet(dir)
      .agg(sum("event_id")).head().getLong(0)

    val (parts, before, after) = Compaction.compact(spark, dir, target)
    assert(parts == 5)
    assert(before == plan0.map(_.getAs[Long]("n_files")).sum)
    assert(after == 5) // tiny partitions bin-pack to one file each

    // content identical through the rewrite, partition columns intact
    assert(spark.read.parquet(dir).count() == nRows)
    assert(spark.read.parquet(dir)
      .agg(sum("event_id")).head().getLong(0) == checksum)
    assert(spark.read.parquet(dir).select("event_type")
      .distinct().count() == 5)

    // a healthy table is never touched again
    val (p2, _, _) = Compaction.compact(spark, dir, target)
    assert(p2 == 0)
    assert(Compaction.plan(spark, dir, target)
      .filter(col("needs_compaction")).count() == 0)
  }

  test("unpartitioned layouts compact as a single root partition") {
    val dir = Files.createTempDirectory("compactu").toString + "/tbl"
    Tables(spark, Sf0001).events.select("event_id")
      .repartition(6).write.parquet(dir)
    val target = 512L * 1024 * 1024
    val plan0 = Compaction.plan(spark, dir, target).collect()
    assert(plan0.length == 1 && plan0.head.getAs[Long]("n_files") == 6)
    val (parts, _, after) = Compaction.compact(spark, dir, target)
    assert(parts == 1 && after == 1)
    assert(spark.read.parquet(dir).count() ==
      Tables(spark, Sf0001).events.count())
  }
}
