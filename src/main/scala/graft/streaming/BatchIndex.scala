package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE persisted-index write/serve contract shared by every
  * incremental index in the engine — MinHash band index
  * ([[DedupStream]]), sign-LSH vector index ([[EmbedStream]]), gram
  * index ([[NoveltyStream]]), postings index
  * ([[graft.ext.Search.appendToSearchIndex]]/[[SearchStream]]).
  * Before this object each implementation repeated the discipline by
  * hand; the contract is:
  *
  *   1. '''batch_id-partitioned dynamic-overwrite writes'''
  *      ([[writePartition]]): each micro-batch lands under its own
  *      `batch_id=` partition with `partitionOverwriteMode=dynamic`, so
  *      an at-least-once checkpoint replay rewrites exactly its own
  *      partition and never duplicates rows — idempotence without a
  *      transaction log.
  *   2. '''replay-excluding reads''' ([[readBefore]]): a batch screens
  *      against `batch_id < ownId` only, so a crash between "write
  *      output" and "extend index" cannot make the replay collide with
  *      its first attempt. Absent-only recovery: a missing/empty index
  *      dir means "first batch" and yields the caller's typed empty
  *      frame; ANY other read failure (corrupt footer, transient FS
  *      error) propagates so the checkpoint retries instead of silently
  *      screening against nothing.
  *   3. '''compaction''' ([[compact]]): per-batch partitions accrete
  *      duplicate rows (a batch cannot know what earlier batches
  *      indexed) and small files; folding into a single distinct
  *      partition under `batch_id = -1` (below every real id, so the
  *      `batch_id < ownId` read keeps working) is staged to a temp dir
  *      and promoted via dynamic partition overwrite INTO the live path
  *      — the live path never stops existing, so a concurrent reader
  *      can never take the empty-index recovery branch. A crash
  *      mid-compaction leaves a duplicate-only (correctness-neutral)
  *      state and the compaction is rerunnable. Replay caveat: folding
  *      committed batches into `-1` means a later replay of one of them
  *      would screen against its own rows — compact only with the
  *      stream stopped and its checkpoint fully committed.
  *
  * At 100 TB the indexes stay hash-sized (bands/buckets/gram hashes,
  * never payloads), writes touch only the current batch's partition,
  * and compaction IO is proportional to the index, never the corpus.
  */
object BatchIndex {

  /** Docs-per-trigger bound under which a stream's BATCH-derived
    * frames (ids, band tables, drop/resent sets) broadcast-join
    * against stored-side scans; above it the hints drop and the joins
    * plan normally (AQE may still pick a broadcast from runtime
    * sizes). The [[graft.ext.CorpusGraph.BroadcastMemberMax]]
    * rationale applied to the TRIGGER: triggers are usually
    * seconds-sized, but a catch-up macro-batch after downtime can
    * carry tens of millions of docs, and a FORCED broadcast of its
    * ~4-rows/doc band table is a multi-GB driver allocation shipped
    * to every executor — an OOM where a shuffle join just pays one
    * exchange of the same rows. ~512k docs ≈ 2 M band rows ≈ 100 MB
    * serialized, comfortably broadcastable with headroom.
    */
  val TriggerBroadcastMaxDocs = 524288L

  /** Contract 1: land `rows` as `batchId`'s own partition of the index
    * at `path`. `bucketCol` adds a leading hash-bucket partition level
    * (the postings layout) and clusters the write so each bucket gets
    * one file per batch.
    */
  def writePartition(rows: DataFrame, batchId: Long, path: String,
      bucketCol: Option[String] = None): Unit = {
    val withId = rows.withColumn("batch_id", lit(batchId))
    val clustered =
      bucketCol.fold(withId)(c => withId.repartition(col(c)))
    clustered.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(bucketCol.toSeq :+ "batch_id": _*)
      .parquet(path)
  }

  /** Contract 2: the accumulated index as visible to `batchId` — every
    * partition strictly before it (including a compacted `-1`),
    * projected to `cols`. `empty` supplies the typed zero-row frame for
    * the first-batch case; any non-absence failure propagates.
    */
  def readBefore(spark: SparkSession, path: String, batchId: Long,
      cols: Seq[String], empty: => DataFrame): DataFrame =
    try {
      spark.read.parquet(path)
        .filter(col("batch_id") < batchId)
        .select(cols.map(col): _*)
    } catch {
      case e: AnalysisException
          if e.getCondition != null
            && (e.getCondition.contains("PATH_NOT_FOUND")
              || e.getCondition.contains("UNABLE_TO_INFER_SCHEMA")) =>
        empty
    }

  /** The key-bucket expression for KEY-bucketed index layouts: indexes
    * whose per-trigger read is an equi-join against the current
    * batch's keys (band hashes, LSH buckets, gram hashes) partition by
    * `bucketCol = keyBucket(B, keyCols…)` so [[readBeforeBuckets]] can
    * prune the read to the buckets the batch actually hits. Without
    * it, every trigger re-scans the WHOLE accumulated index — read IO
    * linear in corpus size, which is what caps a streaming screen's
    * docs/s at scale. pmod of xxhash64 is deterministic across
    * sessions (required: writer and every future reader must agree).
    */
  def keyBucket(buckets: Long,
      keyCols: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(keyCols: _*), lit(buckets))

  /** [[readBefore]] pruned to the `bucketCol` partitions in `buckets`
    * — the per-trigger read of a key-bucketed index. The batch's
    * distinct hit-bucket list is ≤ min(batch keys, B) values, so the
    * scan touches only hit partitions: per-trigger IO proportional to
    * the batch's key spread × (index/B), not the whole index. Rows
    * outside `buckets` cannot join any batch key by construction
    * (same bucket function both sides), so pruning is lossless. Same
    * absent-only recovery and replay-excluding `batch_id < batchId`
    * semantics as [[readBefore]].
    *
    * LISTING COST: the read is constructed from EXPLICIT hit-bucket
    * directory paths (one top-level `listStatus` of the B bucket dirs,
    * intersected with `buckets`, then a `basePath` read of the hit
    * dirs) — NOT a whole-root `spark.read.parquet(path)` with an
    * `isin` filter. Filter-pruned partition discovery lists ALL B × L
    * leaf directories before the filter prunes any of them, which is
    * exactly the measured trigger decay law (SCALING.md "Streaming
    * compaction cadence": trigger wall tracks TOTAL partition dirs,
    * 3× at 65 k, 35× at 262 k). Direct paths cut per-trigger listing
    * from O(B × L) to O(B + hit × L): one directory-entry scan of the
    * top level, then leaf listing only inside hit buckets. The
    * compaction cadence still matters — it bounds L (read volume per
    * hit bucket and duplicate accretion) and file health — but the
    * whole-index metadata walk no longer taxes every trigger.
    */
  def readBeforeBuckets(spark: SparkSession, path: String,
      batchId: Long, cols: Seq[String], empty: => DataFrame,
      bucketCol: String, buckets: Seq[Long]): DataFrame =
    if (buckets.isEmpty) empty
    else presentBuckets(spark, path, bucketCol) match {
      case None => empty // absent index: first batch
      case Some(present) =>
        val hit = buckets.distinct.filter(present.contains)
        if (hit.isEmpty) empty // nothing stored where this batch probes
        else try {
          spark.read.option("basePath", path)
            .parquet(hit.map(b => s"$path/$bucketCol=$b"): _*)
            .filter(col("batch_id") < batchId)
            .select(cols.map(col): _*)
        } catch {
          case e: AnalysisException
              if e.getCondition != null
                && (e.getCondition.contains("PATH_NOT_FOUND")
                  || e.getCondition.contains("UNABLE_TO_INFER_SCHEMA")) =>
            empty // hit dirs exist but hold no files (purged clean)
        }
    }

  /** Direct-path read of the `partCol=v` partition dirs under `path`
    * for v ∈ `values` — the SERVED-index face of [[readBeforeBuckets]]'s
    * listing discipline, for probe-style reads against a value-
    * partitioned layout (IVF `cell=` data, PQ `cell=` codes): a
    * whole-root read with an `isin` filter lists every partition dir
    * before the filter prunes any, so a k-cell probe against an
    * N-cell index pays an O(N × files) metadata walk; one top-level
    * `listStatus` + explicit hit dirs pays O(N + k × files-per-cell).
    * Values with no dir are skipped (lossless for equi-probes — a
    * missing dir holds no rows); absent path or no hit dirs returns
    * `empty`. No batch semantics here — callers add their own filters.
    */
  def readHitPartitions(spark: SparkSession, path: String,
      partCol: String, values: Seq[Long],
      empty: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    val entries =
      try fs.listStatus(p)
      catch { case _: java.io.FileNotFoundException => return empty }
    val prefix = s"$partCol="
    val present = entries.iterator.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(
        n.stripPrefix(prefix).toLong).toOption)
      .toSet
    val hit = values.distinct.filter(present.contains)
    if (hit.isEmpty) empty
    else try {
      spark.read.option("basePath", path)
        .parquet(hit.map(v => s"$path/$partCol=$v"): _*)
    } catch {
      case e: AnalysisException
          if e.getCondition != null
            && (e.getCondition.contains("PATH_NOT_FOUND")
              || e.getCondition.contains("UNABLE_TO_INFER_SCHEMA")) =>
        empty
    }
  }

  /** The bucket values present as `bucketCol=` partition dirs directly
    * under `path` — the one top-level listing a direct-path bucket
    * read needs. None = the path does not exist (absent index).
    * Detects the legacy flat layout (batch_id-only dirs, written
    * before the index was key-bucketed) and fails with the migration
    * message — resuming a checkpoint over a pre-bucketing index is a
    * one-time [[migrateToBucketed]] rewrite, and silently treating it
    * as "no hit buckets" would screen against nothing.
    */
  private def presentBuckets(spark: SparkSession, path: String,
      bucketCol: String): Option[Set[Long]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    val entries =
      try fs.listStatus(p)
      catch { case _: java.io.FileNotFoundException => return None }
    val prefix = s"$bucketCol="
    val present = entries.iterator.filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(
        n.stripPrefix(prefix).toLong).toOption)
      .toSet
    require(present.nonEmpty
        || !entries.exists(e => e.isDirectory
          && e.getPath.getName.contains("=")),
      s"index at $path predates the $bucketCol-bucketed layout — " +
        "run BatchIndex.migrateToBucketed (stream stopped) before " +
        "resuming this checkpoint")
    Some(present)
  }

  /** Read the key-bucket count an index was WRITTEN with — its layout
    * metadata sidecar (`<path>/_graft_buckets`; the `_` prefix keeps
    * it invisible to parquet partition discovery). B is a FUNCTION of
    * corpus size (SCALING.md "Per-trigger read volume": bucket content
    * must stay bounded as the corpus grows), so it cannot live only as
    * a code constant — a reader probing with a different B than the
    * writer's addresses the WRONG buckets and pruning silently drops
    * recall. Absent file = `default` (an index from before this
    * metadata, at its stream's compiled-in fixture B).
    */
  def bucketCountOf(spark: SparkSession, path: String,
      default: Long): Long = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_buckets")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) default
    else {
      val in = fs.open(p)
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** BYTES-per-bucket target of the B-sizing rule. The r15 rule sized
    * B by ROWS (~512/bucket, per-trigger read volume), but the r16
    * rebucket probe measured that rule already LISTING-BOUND at 16 M
    * rows on local fs: B = rows/512 = 32 768 buckets of ~74 KB files,
    * and trigger wall tracks total partition dirs (the
    * [[CompactFileBudget]] table), so a row-pure B buys nothing past
    * the point where each bucket is already a small file — it only
    * multiplies the metadata walk. The binding constraint is FILE
    * HEALTH: size buckets toward healthy parquet files (≳ 8–64 MB),
    * i.e. B = ⌈bytes / target⌉ rounded up to a power of two.
    * Per-trigger reads stay hit-bucket-pruned either way; only the
    * read's granularity grows with the target. 16 MB sits mid-band
    * with 4× [[RebucketDriftFactor]] headroom before a bucket file
    * leaves the healthy range.
    */
  val TargetBytesPerBucket: Long = 16L << 20

  /** Planning width (parquet bytes/row) for hash-row index entries —
    * the width [[autoBucketCount]] assumes when sizing a NEW index
    * from its first batch's ROW count (nothing is on disk yet to
    * measure). Measured: the 4 M-row band index of the SCALING.md
    * compaction-cadence table is 153 MB across 2 048 small files
    * (~38 B/row, footer-heavy); at healthy file sizes the same
    * (long, int, long) rows encode nearer 24–30 B. 32 is the
    * conservative planning constant; a caller with a measured width
    * for its own schema passes it explicitly (e.g. the graph stream's
    * TEXT corpus at ~1 KB/doc). Existing indexes never use this —
    * their drift diagnostics read ACTUAL bytes from the filesystem.
    */
  val DefaultIndexRowBytes: Long = 32L

  /** Bytes-per-bucket drift past which [[layoutReport]] recommends a
    * [[rebucket]]: resizing is a full rewrite, so the rule carries
    * hysteresis — fire at 4× the target (one doubling of B would
    * land the index back inside 2×), not at every crossing.
    */
  val RebucketDriftFactor = 4L

  /** Batch levels per bucket past which [[layoutReport]] recommends a
    * [[compact]]: each committed batch adds one file per touched
    * bucket, and every trigger's partition discovery lists ALL B × L
    * directories — the file-count counterweight to scaling B. The
    * measured law (SCALING.md "Streaming compaction cadence", 4 M-row
    * index, local[32]): trigger wall tracks TOTAL partition count,
    * ~flat to 16 k dirs, 3× at 65 k, 35× at 262 k — and the compaction
    * itself grows with accretion (579 s at 65 k, 2 733 s at 262 k), so
    * the cadence must fire while the repair is still affordable.
    * Hence TWO triggers, either sufficient: levels past this constant,
    * or total dirs past [[CompactFileBudget]].
    */
  val CompactAfterLevels = 16L

  /** Total partition-dir budget (B × batch levels) past which
    * [[layoutReport]] recommends compaction regardless of the level
    * count — at large B a handful of levels already multiplies into
    * the file-count regime the measured table shows degrading
    * (B = 8 192 × L = 8 = 65 k dirs was 2× slower than L = 1).
    */
  val CompactFileBudget = 32768L

  /** The B-sizing rule at index creation: enough power-of-two buckets
    * to hold `keyRows` rows of `rowBytes` width at
    * [[TargetBytesPerBucket]] per bucket, never below `floor` (the
    * compiled fixture default — tiny first batches must not create
    * degenerate 1-bucket layouts). A catch-up first macro batch thus
    * creates its index at a B sized for the data it actually carries
    * instead of the fixture constant, and the [[layoutReport]]
    * diagnostics watch the byte drift from there (against MEASURED
    * bytes, not this planning estimate).
    */
  def autoBucketCount(keyRows: Long, floor: Long,
      rowBytes: Long = DefaultIndexRowBytes,
      targetBytes: Long = TargetBytesPerBucket): Long =
    autoBucketCountBytes(keyRows * math.max(rowBytes, 1L), floor,
      targetBytes)

  /** The byte-rule core: smallest power-of-two multiple of `floor`
    * holding `totalBytes` at ≤ `targetBytes` per bucket.
    */
  def autoBucketCountBytes(totalBytes: Long, floor: Long,
      targetBytes: Long = TargetBytesPerBucket): Long = {
    var b = math.max(floor, 1L)
    while (b * targetBytes < totalBytes) b *= 2
    b
  }

  /** Resolve the bucket count a WRITER must use at `path`: the
    * recorded layout metadata when present; the compiled `default`
    * for an existing pre-metadata index (its rows are laid out at
    * that default — re-deriving would corrupt addressing); and for a
    * NEW index the [[autoBucketCount]] rule over the first batch's
    * key rows (evaluated only in this branch — existing indexes never
    * pay the count).
    */
  def bucketCountForWrite(spark: SparkSession, path: String,
      default: Long, firstBatchKeyRows: => Long,
      rowBytes: Long = DefaultIndexRowBytes): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path, "_graft_buckets")))
      bucketCountOf(spark, path, default)
    else if (fs.exists(p)) default // pre-metadata index: compiled layout
    else autoBucketCount(firstBatchKeyRows, default, rowBytes)
  }

  /** One index's layout health — the diagnostics op behind the B rule
    * and the compaction cadence: MEASURED bytes per bucket vs the
    * byte target (with the [[autoBucketCountBytes]] recommendation
    * when drifted past [[RebucketDriftFactor]]) and batch levels per
    * bucket vs [[CompactAfterLevels]]. Bytes are the filesystem's, not
    * a width estimate — the stored index is the sample the sizing rule
    * wants. A deployment runs this per index on its maintenance
    * cadence and acts on the two booleans; both fixes ([[rebucket]] /
    * [[compact]]) are stream-stopped ops, and [[maintain]] is the
    * wired form of the compact arm.
    */
  final case class LayoutReport(buckets: Long, rows: Long, bytes: Long,
      meanRowsPerBucket: Double, meanBytesPerBucket: Double,
      maxBucketRows: Long,
      batchLevels: Long, maxLevelsPerBucket: Long,
      recommendedBuckets: Long, rebucketRecommended: Boolean,
      compactRecommended: Boolean)

  def layoutReport(spark: SparkSession, path: String, bucketCol: String,
      default: Long,
      targetBytes: Long = TargetBytesPerBucket): LayoutReport =
    layoutReportMulti(spark, path, Seq(bucketCol),
      bucketCountOf(spark, path, default), default, targetBytes)

  /** [[layoutReport]] over layouts with MULTIPLE partition levels
    * above batch_id (the unified media fp index's (modality, bucket)).
    * `buckets` is the reporting denominator — pass the recorded count
    * for single-level layouts; multi-level callers pass the OBSERVED
    * distinct combination count (each combination is one directory
    * fan-out, which is what the file-count cadence prices). `floor`
    * is the resize recommendation's lower bound (the compiled
    * default — a recommendation may shrink BELOW the current count,
    * which is exactly the byte rule's listing-bound repair).
    */
  def layoutReportMulti(spark: SparkSession, path: String,
      bucketCols: Seq[String], buckets: Long, floor: Long,
      targetBytes: Long = TargetBytesPerBucket): LayoutReport = {
    val b = buckets
    val bytes = org.apache.hadoop.fs.FileSystem.get(
        new org.apache.hadoop.fs.Path(path).toUri,
        spark.sparkContext.hadoopConfiguration)
      .getContentSummary(new org.apache.hadoop.fs.Path(path))
      .getLength
    val index = spark.read.parquet(path)
    // ONE scan: a per-(bucket…, batch) cell count first — all are
    // PARTITION columns, so the scan reads no data pages — then the
    // per-bucket rollup AND the global distinct-level count both
    // derive from the cell frame (its exchange is reused across the
    // two branches; the index itself is never re-scanned)
    val cells = index
      .groupBy((bucketCols :+ "batch_id").map(col): _*)
      .agg(count(lit(1)).as("rows"))
    val per = cells.groupBy(bucketCols.map(col): _*)
      .agg(sum("rows").as("rows"), count(lit(1)).as("levels"))
      .agg(sum("rows").as("rows"), max("rows").as("maxRows"),
        max("levels").as("maxLevels"))
      .crossJoin(cells.agg(
        countDistinct(col("batch_id")).as("levels")))
      .head()
    val rows = if (per.isNullAt(0)) 0L else per.getLong(0)
    val maxRows = if (per.isNullAt(1)) 0L else per.getLong(1)
    val maxLevels = if (per.isNullAt(2)) 0L else per.getLong(2)
    val levels = if (per.isNullAt(3)) 0L else per.getLong(3)
    val rec = autoBucketCountBytes(bytes, floor, targetBytes)
    LayoutReport(b, rows, bytes, rows.toDouble / math.max(b, 1L),
      bytes.toDouble / math.max(b, 1L), maxRows,
      levels, maxLevels, rec,
      rebucketRecommended =
        bytes > b * targetBytes * RebucketDriftFactor,
      compactRecommended = maxLevels > CompactAfterLevels
        || b * levels > CompactFileBudget)
  }

  /** Outcome of one [[maintain]] pass: the diagnostics that drove it,
    * the compaction's (before, after) row counts when one ran, and
    * whether a rebucket is (still) recommended — rebuckets change
    * addressing, so they are REPORTED for a deliberate operator run
    * ([[rebucket]] with the stream's own bucket expression), never
    * auto-run.
    */
  final case class Maintenance(report: LayoutReport,
      compacted: Option[(Long, Long)]) {
    def rebucketRecommended: Boolean = report.rebucketRecommended
  }

  /** The maintenance hook that turns [[layoutReport]]'s measured
    * cadence into a running code path: read the diagnostics and run
    * the recommended [[compactMulti]] in one call. The measured decay
    * law (SCALING.md "Streaming compaction cadence": triggers 3× at
    * 65 k partition dirs, 35× at 262 k, while the repair itself grows
    * super-linearly) means a long-running stream that nobody compacts
    * degrades without bound — stream owners call this BETWEEN bounded
    * runs / with the stream stopped and its checkpoint committed (the
    * [[compact]] contract; the caller owns that precondition), e.g.
    * [[DedupStream.maintain]] / [[NoveltyStream.maintain]] /
    * [[EmbedStream.maintain]], wired into [[graft.RunStream]]'s
    * bounded modes. Absent index (stream never committed) returns
    * None — nothing to maintain.
    */
  def maintain(spark: SparkSession, path: String, bucketCol: String,
      default: Long, cols: Seq[String],
      fold: Option[DataFrame => DataFrame] = None,
      targetBytes: Long = TargetBytesPerBucket,
      foldThrough: Long = Long.MaxValue): Option[Maintenance] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) return None
    val report = layoutReport(spark, path, bucketCol, default,
      targetBytes)
    val compacted =
      if (report.compactRecommended)
        Some(compactMulti(spark, path, cols, Seq(bucketCol), fold,
          foldThrough))
      else None
    Some(Maintenance(report, compacted))
  }

  /** Record (or verify) an index's bucket count before writing to it.
    * First write stamps the metadata; later writes FAIL LOUDLY on a
    * mismatch — the state where a stream's compiled-in default moved
    * (or a misconfigured writer attached) without a [[rebucket]], in
    * which new rows would land in buckets no reader probes.
    */
  def ensureBucketMeta(spark: SparkSession, path: String,
      buckets: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_buckets")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val out = fs.create(p, true)
      try out.write(buckets.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } else {
      val have = bucketCountOf(spark, path, buckets)
      require(have == buckets,
        s"index at $path is laid out at $have buckets but the writer " +
          s"is configured for $buckets — run BatchIndex.rebucket " +
          "(stream stopped) before resuming")
    }
  }

  /** Resize a key-bucketed index to `newBuckets` — the maintenance op
    * the B-sizing rule requires as the corpus grows (SCALING.md: keep
    * bucket content at tens of MB; B must scale with the index). Full
    * rewrite under the new layout (`bucketExpr` must be the stream's
    * own key expression evaluated at the NEW count), staged then
    * swapped; the metadata rides INSIDE the staged dir so the rename
    * promotes data + layout record atomically — a crash leaves either
    * the old consistent index or the new one, never data at one B
    * with metadata at another. Run with the stream stopped;
    * rerunnable (same recovery shape as [[migrateToBucketed]]).
    */
  def rebucket(spark: SparkSession, path: String, bucketCol: String,
      newBuckets: Long,
      bucketExpr: Long => org.apache.spark.sql.Column): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".rebucketing")
    if (fs.exists(live)) {
      fs.delete(tmp, true) // partial stage from a crashed run
      // mergeSchema: same reason as [[compactMulti]] — a full rewrite
      // that inferred schema from the first-listed file would silently
      // drop columns added by later batches of a schema-evolved index
      val index = spark.read.option("mergeSchema", "true").parquet(path)
      index.drop(bucketCol)
        .withColumn(bucketCol, bucketExpr(newBuckets))
        .repartition(col(bucketCol))
        .write.partitionBy(bucketCol, "batch_id").parquet(tmp.toString)
      // layout record INSIDE the stage — promoted by the same rename
      val out = fs.create(
        new org.apache.hadoop.fs.Path(tmp, "_graft_buckets"), true)
      try out.write(newBuckets.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(live, true)
    } else require(fs.exists(tmp),
      s"nothing to rebucket at $path (no index, no staged copy)")
    fs.rename(tmp, live)
    spark.catalog.refreshByPath(path) // drop pre-rebucket cached plans
    ()
  }

  /** One-time, in-place migration of an index written under the flat
    * `batch_id=`-only layout to the key-bucketed `bucketCol/batch_id`
    * layout every [[readBeforeBuckets]] stream now requires
    * ([[DedupStream]]/[[GraphStream]] band indexes, [[EmbedStream]]
    * LSH tables, [[NoveltyStream]] gram index). `bucketExpr(buckets)`
    * must be the stream's own bucket expression at the migration's
    * target count (e.g. [[DedupStream.bandBucketAt]]) — writer and
    * every future reader must agree, which is why the count is ALSO
    * stamped as `_graft_buckets` layout metadata inside the staged dir
    * (the [[rebucket]] discipline: data and layout record promote in
    * one rename — a migrated index left without metadata would resolve
    * whatever compiled-in default a FUTURE reader ships, silently
    * losing recall the moment that default moves). Run with the stream
    * stopped; rerunnable: a crash before the old layout is deleted
    * restages from the live data, a crash after it completes the
    * promote from the staged copy (the stage is only ever
    * deleted-then-renamed once its write fully committed). No-op when
    * the index already carries `bucketCol` — except stamping the
    * metadata if a pre-metadata migration left it absent.
    */
  def migrateToBucketed(spark: SparkSession, path: String,
      bucketCol: String, buckets: Long,
      bucketExpr: Long => org.apache.spark.sql.Column): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".rebucketing")
    if (fs.exists(live)) {
      fs.delete(tmp, true) // partial stage from a crashed run
      // mergeSchema: a full rewrite must not drop columns added by
      // later batches of a schema-evolved index (the compact rationale)
      val index = spark.read.option("mergeSchema", "true").parquet(path)
      if (index.columns.contains(bucketCol)) {
        // already bucketed — just ensure the layout metadata exists
        // (verifies on mismatch rather than silently restamping)
        ensureBucketMeta(spark, path, buckets)
        return
      }
      index.withColumn(bucketCol, bucketExpr(buckets))
        .repartition(col(bucketCol))
        .write.partitionBy(bucketCol, "batch_id").parquet(tmp.toString)
      // layout record INSIDE the stage — promoted by the same rename
      val out = fs.create(
        new org.apache.hadoop.fs.Path(tmp, "_graft_buckets"), true)
      try out.write(buckets.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      fs.delete(live, true)
    } else require(fs.exists(tmp),
      s"nothing to migrate at $path (no index, no staged copy)")
    fs.rename(tmp, live)
    spark.catalog.refreshByPath(path) // drop pre-migration cached plans
    ()
  }

  /** Contract 3: fold every committed `batch_id >= 0` partition into
    * one `batch_id = -1` partition (per bucket when `bucketCol` is
    * set). `fold` is the merge semantics — distinct rows by default,
    * an aggregation for mergeable-sketch indexes. Returns (rows
    * before, rows after). Run only with the stream stopped (see
    * object doc). Crash window: the `-1` rows promote before the old
    * partitions delete, so a crash can leave BOTH visible — row-level
    * duplicates are correctness-neutral for distinct-fold indexes,
    * but an index whose serving SUMS across rows must screen batch
    * rows out of folded buckets at read time (the SketchIndex
    * discipline) or rerun the compaction before serving accounting.
    */
  def compact(spark: SparkSession, path: String, cols: Seq[String],
      bucketCol: Option[String] = None,
      fold: Option[DataFrame => DataFrame] = None): (Long, Long) =
    compactMulti(spark, path, cols, bucketCol.toSeq, fold)

  /** [[compact]] for indexes with MULTIPLE partition levels above
    * batch_id (the unified media fingerprint index's (modality,
    * bucket)); same contract, the fold keys on every level.
    */
  def compactMulti(spark: SparkSession, path: String, cols: Seq[String],
      bucketCols: Seq[String],
      fold: Option[DataFrame => DataFrame] = None,
      foldThrough: Long = Long.MaxValue): (Long, Long) = {
    import spark.implicits._
    val parts = bucketCols :+ "batch_id"
    // mergeSchema: a custom fold may have added columns (e.g. the
    // sketch index's folded_through) that plain per-file inference
    // would drop when the first-listed file predates them
    val full = spark.read.option("mergeSchema", "true").parquet(path)
    val before = full.count()
    // foldThrough: partitions above the caller's last fully-committed
    // batch are left in place — NOT folded, NOT deleted. An in-flight
    // batch interrupted mid-processBatch has landed SOME of its
    // artifacts (e.g. a graph trigger's bands but not its pairs);
    // folding those rows into `-1` would defeat the reader-side
    // `batch_id < storedId` replay exclusion — the replay would see
    // its own first attempt as stored state, classify every doc as
    // re-sent, and silently never produce the batch's evidence.
    // Callers that know their committed boundary (RunStream's
    // post-run maintenance) pass it; Long.MaxValue folds everything
    // (safe only when checkpoints are known committed).
    val index = full.filter(col("batch_id") <= foldThrough)
    // nothing in fold scope (a fresh index, or a bound below every
    // partition): writing an empty partitioned frame emits only
    // _SUCCESS and the tmp read-back would throw UNABLE_TO_INFER_SCHEMA
    // after staging — short-circuit instead of half-running
    if (index.isEmpty) return (before, before)
    // bounded collect: one row per LIVE partition directory — ≤ buckets
    // × committed batches (the partition space, never row counts), and
    // compaction's whole point is to keep that space folded down
    val liveDirs: Seq[String] = {
      val live = index.filter(col("batch_id") >= 0L)
      live.select(parts.map(c => col(c).cast("string")): _*)
        .distinct().collect().toIndexedSeq
        .map(r => parts.indices
          .map(i => s"${parts(i)}=${r.getString(i)}").mkString("/"))
    }
    val tmp = new org.apache.hadoop.fs.Path(path + ".compacting")
    // default fold: distinct rows over the index columns; a custom fold
    // sees the FULL frame (incl. batch_id) for merge semantics that
    // need it (aggregating sketch registers, recording folded_through)
    val folded = fold.getOrElse((df: DataFrame) =>
      df.select((bucketCols ++ cols).distinct.map(col): _*)
        .distinct())(index)
    folded
      .withColumn("batch_id", lit(-1L))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(parts: _*).parquet(tmp.toString)
    spark.read.parquet(tmp.toString)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(parts: _*).parquet(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    liveDirs.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(path, d), true)
      ()
    }
    fs.delete(tmp, true)
    // cached plans over the pre-compaction files must not outlive the
    // fold (nor feed the count below)
    spark.catalog.refreshByPath(path)
    val after = spark.read.parquet(path).count()
    (before, after)
  }
}
