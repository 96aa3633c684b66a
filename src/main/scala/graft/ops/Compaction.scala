package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction for (optionally hive-partitioned) parquet
  * layouts — the operational complement of the write-side layout
  * operators ([[Layout]] Z-order, [[graft.ext.Shards]] finalization):
  * streaming sinks and incremental ingest
  * ([[graft.streaming.EventPipeline]]'s per-batch dynamic overwrite,
  * [[graft.ext.Search.appendToSearchIndex]]) accrete one-file-per-batch
  * fragments, and at 100 TB the resulting per-file footer/open overhead
  * dominates scan cost long before data volume does.
  *
  * Design for scale:
  *   - '''IO proportional to fragmentation, not table size''': a
  *     partition is rewritten ONLY when its file count exceeds the
  *     bin-packed minimum `ceil(bytes / targetBytes)` — an
  *     already-compact partition is never read, so repeated runs are
  *     cheap no-ops over the healthy bulk of the table;
  *   - '''per-partition atomicity''': each rewrite lands in a sibling
  *     temp dir and is promoted by rename (the [[Incidents.compactLog]]
  *     snapshot-to-temp + swap discipline), so readers never observe a
  *     half-compacted partition and a crash leaves the original intact;
  *   - '''driver loops partitions, executors move bytes''': the
  *     partition list is catalog-sized (bounded), while each rewrite is
  *     a distributed read→coalesce→write job.
  */
object Compaction {

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)

  /** Visible data files of a partition dir (skips _SUCCESS etc.). */
  private def dataFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).toSeq.filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.startsWith("."))

  /** Partition directories of a one-level hive layout (`k=v` subdirs),
    * or the root itself when unpartitioned.
    */
  private def partitionDirs(fs: FileSystem, root: Path): Seq[Path] = {
    val subs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath)
    if (subs.nonEmpty) subs.sortBy(_.getName.toString) else Seq(root)
  }

  /** Compaction plan: per partition, current file count / bytes, the
    * bin-packed target file count, and whether a rewrite pays. Pure
    * metadata — no data files are opened.
    */
  def plan(spark: SparkSession, path: String,
      targetBytes: Long): DataFrame = {
    val root = new Path(path)
    val fs = fsFor(spark, root)
    val rows = partitionDirs(fs, root).map { d =>
      val files = dataFiles(fs, d)
      val bytes = files.map(_.getLen).sum
      val after = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      (d.getName, files.size.toLong, bytes, after,
        files.size > after)
    }
    import spark.implicits._
    rows.toDF("partition", "n_files", "bytes", "files_after",
      "needs_compaction")
  }

  /** Rewrite every fragmented partition down to its bin-packed file
    * count. Returns (partitions compacted, files before, files after)
    * over the touched partitions only.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long): (Int, Long, Long) = {
    val root = new Path(path)
    val fs = fsFor(spark, root)
    var parts = 0
    var before = 0L
    var after = 0L
    partitionDirs(fs, root).foreach { d =>
      val files = dataFiles(fs, d)
      val bytes = files.map(_.getLen).sum
      val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      if (files.size > target) {
        // dot-prefixed siblings: hive partition discovery skips hidden
        // dirs, so concurrent readers of the table root never see the
        // in-flight rewrite as a phantom partition
        val tmp = new Path(d.getParent, "." + d.getName + ".compacting")
        fs.delete(tmp, true)
        spark.read.parquet(d.toString)
          .coalesce(target.toInt)
          .write.mode("overwrite").parquet(tmp.toString)
        val staged = new Path(d.getParent, "." + d.getName + ".pre-compaction")
        fs.delete(staged, true)
        require(fs.rename(d, staged), s"could not stage $d aside")
        require(fs.rename(tmp, d), s"could not promote $tmp")
        fs.delete(staged, true)
        parts += 1
        before += files.size
        after += dataFiles(fs, d).size
      }
    }
    (parts, before, after)
  }
}
