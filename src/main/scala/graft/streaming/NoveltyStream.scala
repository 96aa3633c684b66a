package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.TextAnalysis

/** Streaming novelty scoring: each micro-batch of documents is scored
  * against the accumulated corpus gram index
  * ([[graft.ext.TextAnalysis.noveltyAgainst]] semantics — non-novel if
  * the corpus has the gram or ≥2 batch docs share it), per-doc reports
  * land in a `batch_id`-partitioned sink, and the batch's distinct gram
  * hashes extend the index — the streaming twin of
  * [[graft.ext.TextAnalysis.noveltyServed]].
  *
  * The index stores one 8-byte xxhash64 per distinct gram (never text),
  * the same at-scale footprint argument as [[DedupStream]]'s band index.
  * Idempotence contract matches [[EventPipeline.processBatch]]: both
  * writes are partitioned by `batch_id` with dynamic overwrite, a replay
  * rewrites its own partitions, the index read excludes the batch's own
  * partition (a crash between the two writes must not make the batch
  * screen against its own first attempt), and accumulators move only
  * after both writes commit.
  */
object NoveltyStream {

  /** Key-bucket count for the persisted gram index layout
    * (`band_bucket = keyBucket(h) / batch_id=<n>`): novelty scoring
    * joins batch grams against the index on `h`, so each trigger's
    * read prunes to the batch's hit buckets (the
    * [[DedupStream.BandBuckets]] rationale, gram side). An index
    * written flat (pre-bucketing) cannot be mixed in place — run
    * [[BatchIndex.migrateToBucketed]] with [[gramBucket]] before
    * resuming the checkpoint (the read fails with that recipe).
    */
  val KeyBuckets = 64L

  /** The gram-bucket expression at bucket count `b` — writer and
    * every reader of ONE index must agree; the count lives in the
    * index's layout metadata ([[BatchIndex.bucketCountOf]]) so
    * [[BatchIndex.rebucket]] can scale it with the corpus.
    */
  def gramBucketAt(b: Long): org.apache.spark.sql.Column =
    BatchIndex.keyBucket(b, col("h"))

  /** The expression at the configured default (new indexes/fixtures). */
  def gramBucket: org.apache.spark.sql.Column = gramBucketAt(KeyBuckets)

  final class NoveltyStats(spark: org.apache.spark.sql.SparkSession)
      extends Serializable {
    val seen = spark.sparkContext.longAccumulator("novelty_seen")
    val novel = spark.sparkContext.longAccumulator("novelty_fully_novel")
    @volatile var lastCommitted: Long = -1L
  }

  /** One idempotent micro-batch score+extend (the foreachBatch body of
    * [[start]], extracted so StreamingSpec can replay it).
    */
  def processBatch(batch: DataFrame, batchId: Long, reportPath: String,
      indexPath: String, stats: NoveltyStats): Unit =
    if (batchId > stats.lastCommitted) {
      val spark = batch.sparkSession
      val cached = batch.persist()
      try {
        val nSeen = cached.count()
        if (nSeen == 0) return
        val grams = TextAnalysis.gramIndex(cached).persist()
        // recorded layout metadata; auto-sized for a NEW index from
        // the first batch's gram rows (BatchIndex.autoBucketCount)
        val b = BatchIndex.bucketCountForWrite(spark, indexPath,
          KeyBuckets, grams.count())
        val hit = grams.select(gramBucketAt(b).as("band_bucket"))
          .distinct().collect().map(_.getLong(0)).toSeq
        val index = BatchIndex.readBeforeBuckets(spark, indexPath,
          batchId, Seq("h"), TextAnalysis.gramIndex(cached.limit(0)),
          "band_bucket", hit)
        val report = TextAnalysis.noveltyAgainst(index, cached)
          .withColumn("batch_id", lit(batchId))
          .persist()
        try {
          val nNovel = report.filter(col("novelty") === 1.0).count()
          report.write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(reportPath)
          BatchIndex.ensureBucketMeta(spark, indexPath, b)
          BatchIndex.writePartition(
            grams.withColumn("band_bucket", gramBucketAt(b)),
            batchId, indexPath, bucketCol = Some("band_bucket"))
          stats.seen.add(nSeen); stats.novel.add(nNovel)
          stats.lastCommitted = batchId
          ()
        } finally { report.unpersist(); grams.unpersist(); () }
      } finally { cached.unpersist(); () }
    }

  /** Compact the gram index: batches re-append grams the index already
    * holds (the per-batch write cannot know), so after many ingests the
    * index carries cross-partition duplicates — correctness-neutral
    * (the scorer distincts the matched set before its probe join,
    * [[graft.ext.TextAnalysis.noveltyAgainst]]) but scan cost grows past
    * the distinct gram volume. Delegates to [[BatchIndex.compact]] —
    * distinct-`h` fold into `batch_id = -1`, promoted via dynamic
    * overwrite so the live path never stops existing; run only with the
    * stream stopped (see the contract doc there). Returns
    * (rows before, rows after).
    */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): (Long, Long) =
    BatchIndex.compactMulti(spark, indexPath, Seq("h"),
      bucketCols = Seq("band_bucket"))

  /** The wired maintenance cadence ([[BatchIndex.maintain]]) for the
    * gram index — stream stopped + checkpoint committed only.
    */
  def maintain(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[BatchIndex.Maintenance] =
    BatchIndex.maintain(spark, indexPath, "band_bucket", KeyBuckets,
      Seq("h"))

  /** Attach the novelty scorer to a documents stream. */
  def start(stream: DataFrame, reportPath: String, indexPath: String,
      checkpointDir: String, stats: NoveltyStats,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"))
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, reportPath, indexPath, stats)
      }
      .start()
}
