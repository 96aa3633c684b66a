package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest for the mergeable HLL sketch index
  * ([[graft.ext.SketchIndex]]): each micro-batch lands its own
  * per-(day, event_type) sketch rows under (day, batch_id) partitions —
  * the BatchIndex discipline, so a replayed batch dynamic-overwrites
  * ONLY its own files and other batches' contributions to the same day
  * survive. Serving unions sketches across batch partitions exactly
  * like the batch-built index (HLL register-max is associative,
  * commutative AND idempotent, so replay can never inflate the
  * estimate); `sum(n_events)` accounting stays exact because replay
  * replaces rather than appends.
  *
  * At 100 TB: each micro-batch aggregates only itself (combinable,
  * day×type keys); the index grows by KB-rows per batch; no corpus
  * state is ever rewritten. Compact (stream stopped) folds batch rows
  * per day back to one row via the same union.
  */
object SketchStream {

  final class SketchStats(spark: org.apache.spark.sql.SparkSession)
      extends Serializable {
    val events = spark.sparkContext.longAccumulator("sketch_events")
    @volatile var lastCommitted: Long = -1L
  }

  private def sketchRows(batch: DataFrame): DataFrame =
    batch.select(expr("unix_millis(ts) div 86400000").as("day"),
      col("event_type"), col("user_id"))
      .groupBy("day", "event_type")
      .agg(hll_sketch_agg(col("user_id"),
        lit(graft.ext.SketchIndex.LgK)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** One idempotent micro-batch ingest (extracted for replay specs). */
  def processBatch(batch: DataFrame, batchId: Long, indexPath: String,
      stats: SketchStats): Unit =
    if (batchId > stats.lastCommitted) {
      val spark = batch.sparkSession
      spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode", "dynamic")
      val rows = sketchRows(batch)
        .withColumn("batch_id", lit(batchId)).persist()
      try {
        stats.events.add(
          rows.agg(sum("n_events")).head().getLong(0))
        rows.write.mode("overwrite")
          .partitionBy("day", "batch_id").parquet(indexPath)
        stats.lastCommitted = batchId
      } finally { rows.unpersist(); () }
    }

  /** Fold the per-batch rows into one row per (day, event_type) —
    * stream stopped only. Union is lossless for HLL registers, so
    * served answers are identical before and after.
    */
  def compact(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    import spark.implicits._
    val index = spark.read.parquet(indexPath)
    val live = index.select(col("day"), col("batch_id"))
      .distinct().as[(Long, Long)].collect().filter(_._2 >= 0L)
    // tmp-then-overwrite (the BatchIndex.compact discipline): the live
    // path always has every day partition; no missing-index window
    val tmp = new org.apache.hadoop.fs.Path(indexPath + ".compacting")
    index.groupBy("day", "event_type")
      .agg(hll_union_agg(col("sketch")).as("sketch"),
        sum("n_events").as("n_events"))
      .withColumn("batch_id", lit(-1L))
      .write.mode("overwrite").partitionBy("day", "batch_id")
      .parquet(tmp.toString)
    spark.read.parquet(tmp.toString)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day", "batch_id").parquet(indexPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    live.foreach { case (d, b) =>
      fs.delete(new org.apache.hadoop.fs.Path(indexPath,
        s"day=$d/batch_id=$b"), true)
      ()
    }
    fs.delete(tmp, true)
    ()
  }

  /** Attach the sketch ingest to an event stream. */
  def start(stream: DataFrame, indexPath: String, checkpointDir: String,
      stats: SketchStats,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"))
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath, stats)
      }
      .start()
}
