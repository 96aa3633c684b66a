package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.util.LongAccumulator

import graft.dq.{DqSuite, Expectation}

/** Streaming data-quality monitor: evaluates an [[Expectation]] suite on
  * every micro-batch of a stream, through the business-name alias layer,
  * and maintains both a per-batch result log (parquet, idempotent under
  * replay) and run-level per-expectation counters.
  *
  * The reference runs its GE checkpoint once per batch DAG cycle
  * (`airflow/dags/pipeline_dag.py` validate task + `dq/ge_checkpoint.yml`);
  * a streaming engine has to run the same suite continuously. foreachBatch
  * gives each micro-batch as a static frame, so the exact batch evaluator
  * ([[DqSuite.evaluate]] — one scan, map-side-combinable counts) is reused
  * unchanged: no separate streaming DQ implementation to drift out of sync.
  *
  * Scale shape: the per-batch work is one pass over the batch with a
  * single wide aggregate (O(|suite|) counters per partition, combined on
  * one reducer — bounded data, the allowed SinglePartition shape); the
  * result log appends O(|suite|) rows per batch. Nothing about the
  * corpus-sized input crosses a shuffle beyond the count combine.
  */
object DqMonitor {

  /** Run-level DQ state across micro-batches: one (evaluated, failed)
    * accumulator pair per expectation, plus the idempotence high-water
    * mark (same contract as [[EventPipeline.RunStats.lastCommitted]]).
    */
  final class DqStreamStats(spark: SparkSession, val suite: Seq[Expectation])
      extends Serializable {
    val evaluated: IndexedSeq[LongAccumulator] = suite.indices.map(i =>
      spark.sparkContext.longAccumulator(s"dq_ev_$i"))
    val failed: IndexedSeq[LongAccumulator] = suite.indices.map(i =>
      spark.sparkContext.longAccumulator(s"dq_fail_$i"))
    @volatile var lastCommitted: Long = -1L

    /** (expectation, column, n_evaluated, n_failed) totals so far. */
    def summary: Seq[(String, String, Long, Long)] =
      suite.zipWithIndex.map { case (e, i) =>
        (e.name, e.column, evaluated(i).value, failed(i).value)
      }

    /** Suite-level verdict so far (GE "checkpoint passed" semantics). */
    def allPassed: Boolean = failed.forall(_.value == 0L)
  }

  /** One idempotent micro-batch DQ evaluation (the foreachBatch body of
    * [[start]], extracted so StreamingSpec can replay it).
    *
    *   - `aliases` business→technical mappings are applied first, so the
    *     suite may be authored in business names ([[DqSuite.FieldMappings]]);
    *   - per-batch results land in `resultsPath` partitioned by batch_id
    *     with DYNAMIC overwrite — a replayed batch rewrites its own
    *     partition instead of appending duplicate result rows;
    *   - accumulators update only after the write commits, gated on
    *     batchId > lastCommitted, so replays never double-count.
    */
  def processDqBatch(batch: DataFrame, batchId: Long,
      stats: DqStreamStats, resultsPath: String,
      aliases: Seq[(String, String)] = Nil,
      notifier: Option[graft.ops.PipelineRun.Notifier] = None): Unit =
    if (batchId > stats.lastCommitted) {
      val frame = DqSuite.withAliases(batch, aliases)
      val resultsDf = DqSuite.evaluate(frame, stats.suite)
        .withColumn("batch_id", lit(batchId))
      // one scan of the batch: collect the O(|suite|) result rows, then
      // write THOSE (not the plan) so the sink doesn't rescan the input
      val rows = resultsDf.collect()
      val spark = batch.sparkSession
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.toSeq.asJava, resultsDf.schema)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(resultsPath)
      rows.foreach { r =>
        val i = r.getAs[Long]("exp_idx").toInt - 1
        stats.evaluated(i).add(r.getAs[Long]("n_evaluated"))
        stats.failed(i).add(r.getAs[Long]("n_failed"))
      }
      stats.lastCommitted = batchId
      // alert AFTER commit, gated by the same high-water mark, so a
      // replayed batch never re-alerts. Counts are CHECK-level (each
      // expectation evaluates ~every batch row); severity rides the
      // reference's failure-rate ladder (notifications.py:296-304).
      notifier.foreach { n =>
        val affected = rows.map(_.getAs[Long]("n_failed")).sum
        val total = math.max(1L, rows.map(_.getAs[Long]("n_evaluated")).sum)
        if (affected > 0) {
          val failing = rows.count(_.getAs[Long]("n_failed") > 0)
          val (title, msg, sev) = graft.ops.Notifications.dataQualityIssue(
            "validation_failure", affected, total,
            Some(s"batch $batchId: $failing of ${rows.length} " +
              "expectations failing"))
          n.notify(sev, s"$title\n$msg")
        }
      }
    }

  /** Attach the monitor to a stream: every micro-batch is evaluated
    * against `stats.suite` (through `aliases`) and logged to
    * `resultsPath`. Runs as its own sink so it composes with the dual
    * data sink — the same stream can feed both.
    */
  def start(stream: DataFrame, stats: DqStreamStats, resultsPath: String,
      checkpointDir: String, aliases: Seq[(String, String)] = Nil,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      notifier: Option[graft.ops.PipelineRun.Notifier] = None)
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processDqBatch(batch, batchId, stats, resultsPath, aliases,
          notifier)
      }
      .start()
}
