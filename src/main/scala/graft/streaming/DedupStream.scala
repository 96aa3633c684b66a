package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** Streaming corpus ingestion with incremental near-dup screening: each
  * micro-batch of documents is checked against a persistent MinHash band
  * index (the accumulated corpus), survivors are appended to the corpus
  * sink, and their bands extend the index — the streaming twin of
  * [[graft.ext.Dedup.incrementalNearDups]].
  *
  * Screening here is LSH-candidate-level (any shared band ⇒ duplicate):
  * the index stores only `(doc_id, band_idx, band_hash)`, never text, so
  * it stays ~48 bytes/doc — small enough to keep as a bucketed table at
  * 100 TB corpus scale. Candidate-level screening is the high-recall
  * gate a streaming ingest wants; the exact-Jaccard verified pass
  * ([[graft.ext.Dedup.minhashNearDups]]) runs in the batch layer.
  * Batch-internal dups are also dropped (lowest doc_id survives, same
  * keep-first policy as the batch operators).
  *
  * Idempotence contract matches [[EventPipeline.processBatch]]: corpus
  * and index writes are partitioned by batch_id with dynamic overwrite
  * (a replayed batch rewrites its own partitions), and the survivor
  * accumulators move only after both writes commit, gated on the
  * high-water mark.
  */
object DedupStream {

  /** Band-hash bucket count for the persisted band index layout:
    * `band_bucket = keyBucket(band_hash) / batch_id=<n>`. The
    * per-trigger screen is an equi-join on `(band_idx, band_hash)`,
    * so the read prunes to the batch's hit buckets instead of
    * re-scanning the whole accumulated index — per-trigger IO is
    * (hit buckets / B) × index, flat in corpus size once B exceeds
    * the batch's distinct band-hash count. 64 at fixture scale; a
    * 100 TB deployment sizes B ≫ (trigger docs × NumBands) — the
    * [[graft.ext.Multimodal.MediaFpBuckets]] sizing rule applied to
    * the band key. Layout note: an index written flat (pre-bucketing)
    * cannot be mixed in place — run [[BatchIndex.migrateToBucketed]]
    * with [[bandBucket]] before resuming the checkpoint (the read
    * fails with that recipe).
    */
  val BandBuckets = 64L

  /** Probe seam over [[BandBuckets]] (ScaleProbe's B-scaling sweep —
    * the measurement behind the sizing rule above): read at call time
    * by writer AND readers, so it may only change between INDEXES,
    * never mid-life of one — a mixed-B index is a layout corruption.
    */
  @volatile private[graft] var bandBucketCount: Long = BandBuckets

  /** The band-bucket expression at bucket count `b` — writer and every
    * reader of ONE index must agree, which is why the count lives in
    * the index's own layout metadata ([[BatchIndex.bucketCountOf]])
    * and not only in code: re-bucketing as the corpus grows
    * ([[BatchIndex.rebucket]]) must not strand readers at the old B.
    */
  def bandBucketAt(b: Long): org.apache.spark.sql.Column =
    BatchIndex.keyBucket(b, col("band_hash"))

  /** The band-bucket expression at the CONFIGURED default count — for
    * new indexes and fixtures; an existing index's reads/writes go
    * through [[bandBucketAt]] with its recorded count.
    */
  def bandBucket: org.apache.spark.sql.Column =
    bandBucketAt(bandBucketCount)

  final class DedupStats(spark: org.apache.spark.sql.SparkSession)
      extends Serializable {
    val seen = spark.sparkContext.longAccumulator("dedup_seen")
    val kept = spark.sparkContext.longAccumulator("dedup_kept")
    @volatile var lastCommitted: Long = -1L
  }

  /** Docs of `batch` that collide with `index` bands or with an
    * earlier batch-mate's bands (keep-first within the batch).
    */
  private def dropSet(batchBands: DataFrame, index: DataFrame): DataFrame = {
    val vsIndex = batchBands.as("b")
      .join(index.as("i"),
        col("b.band_idx") === col("i.band_idx")
          && col("b.band_hash") === col("i.band_hash"))
      .select(col("b.doc_id"))
    val inBatch = batchBands.as("a").join(batchBands.as("b"),
        col("a.band_idx") === col("b.band_idx")
          && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("b.doc_id"))
    vsIndex.unionByName(inBatch).distinct()
  }

  /** One idempotent micro-batch ingest (the foreachBatch body of
    * [[start]], extracted so StreamingSpec can replay it).
    */
  def processBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      indexPath: String, stats: DedupStats): Unit =
    if (batchId > stats.lastCommitted) {
      val spark = batch.sparkSession
      // one materialization of the micro-batch: every action below
      // (count, band build, survivor write) reuses it instead of
      // re-reading the source per action
      val cached = batch.persist()
      try {
        val nSeen = cached.count()
        if (nSeen == 0) return
        val bands = Dedup.bandTable(cached).persist()
        try {
          // THIS index's bucket count: its layout metadata when it
          // exists, the compiled default for a pre-metadata index, and
          // the auto-sizing rule over the first batch's band rows for
          // a NEW index (a catch-up first macro batch creates its
          // layout at corpus-proportional B, not the fixture constant)
          // — probing with any other B would address the wrong buckets
          val b = BatchIndex.bucketCountForWrite(spark, indexPath,
            bandBucketCount, bands.count())
          // pruned read: only the band buckets this batch's hashes
          // hit — the screen joins on (band_idx, band_hash), so rows
          // in other buckets cannot match by construction
          val hitBuckets = bands
            .select(bandBucketAt(b).as("band_bucket")).distinct()
            .collect().map(_.getLong(0)).toSeq
          val index = BatchIndex.readBeforeBuckets(spark, indexPath,
            batchId, Seq("doc_id", "band_idx", "band_hash"),
            Dedup.bandTable(cached.limit(0)), "band_bucket", hitBuckets)
          val drops = dropSet(bands, index).persist()
          val survivors = cached
            .join(broadcast(drops), Seq("doc_id"), "left_anti")
            .persist()
          val nKept = survivors.count()
          BatchIndex.writePartition(survivors, batchId, corpusPath)
          BatchIndex.ensureBucketMeta(spark, indexPath, b)
          BatchIndex.writePartition(
            bands.join(broadcast(drops), Seq("doc_id"), "left_anti")
              .withColumn("band_bucket", bandBucketAt(b)),
            batchId, indexPath, bucketCol = Some("band_bucket"))
          stats.seen.add(nSeen); stats.kept.add(nKept)
          stats.lastCommitted = batchId
          drops.unpersist(); survivors.unpersist()
          ()
        } finally { bands.unpersist(); () }
      } finally { cached.unpersist(); () }
    }

  /** Fold the band index's per-batch partitions into one distinct
    * partition ([[BatchIndex.compact]] contract — stream stopped only).
    * Bands are unique per doc so this is small-file folding, not
    * duplicate removal. Cadence: run when
    * [[BatchIndex.layoutReport]] reports `compactRecommended` (levels
    * per bucket past [[BatchIndex.CompactAfterLevels]]) — the
    * file-count counterweight to the B ∝ corpus sizing rule, measured
    * in SCALING.md "Streaming compaction cadence".
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): (Long, Long) =
    BatchIndex.compactMulti(spark, indexPath,
      Seq("doc_id", "band_idx", "band_hash"),
      bucketCols = Seq("band_bucket"))

  /** The wired maintenance cadence ([[BatchIndex.maintain]]) for the
    * band index: diagnose layout, run the recommended compaction.
    * Stream stopped + checkpoint committed only (the [[compactIndex]]
    * contract) — callers run it between bounded runs.
    */
  def maintain(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[BatchIndex.Maintenance] =
    BatchIndex.maintain(spark, indexPath, "band_bucket",
      bandBucketCount, Seq("doc_id", "band_idx", "band_hash"))

  /** Attach the dedup ingest to a documents stream. */
  def start(stream: DataFrame, corpusPath: String, indexPath: String,
      checkpointDir: String, stats: DedupStats,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"))
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, corpusPath, indexPath, stats)
      }
      .start()
}
