package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.{Curation, TextAnalysis}

/** Streaming corpus curation — the ingest-time composition of the
  * batch funnel ([[graft.RunCuration]]) for a document stream:
  *
  *   canonicalize (NFC + whitespace + case, [[Curation.normalizeText]])
  *   → named-rule quality gate ([[TextAnalysis.qualityFilter]])
  *   → incremental near-dup screen + corpus + band index
  *     ([[DedupStream.processBatch]], the BatchIndex discipline)
  *
  * Each stage is the SAME operator the verified queries pin; this
  * object only sequences them per micro-batch, so a streaming corpus
  * and a batch-curated corpus apply identical semantics. Idempotence
  * and replay safety are inherited from [[DedupStream]] (batch_id
  * dynamic-overwrite writes, replay-excluding index reads); the
  * normalize+gate prefix is stateless, so replaying it is free.
  *
  * At 100 TB/day: normalize and gate are pure map-side codegen over
  * the batch, the near-dup screen joins batch bands against the
  * accumulated index (batch-sized work), and the corpus/index writes
  * touch only this batch's partitions.
  */
object CurateStream {

  final class CurateStats(spark: org.apache.spark.sql.SparkSession)
      extends Serializable {
    /** Raw docs entering the funnel. */
    val seen = spark.sparkContext.longAccumulator("curate_seen")
    /** Docs the benchmark-decontam Bloom gate dropped. */
    val decontamDropped =
      spark.sparkContext.longAccumulator("curate_decontam_dropped")
    /** Delegated dedup-stage stats; its `seen` is the gate's survivor
      * count, its `kept` the corpus-bound survivor count.
      */
    val dedup = new DedupStream.DedupStats(spark)
  }

  /** One idempotent micro-batch: canonicalize, quality-gate,
    * optionally decontam-screen, then delegate to the dedup ingest
    * (which re-checks the replay guard itself).
    *
    * `benchBits` is the benchmark's Bloom position table
    * ([[Curation.bloomBits]], built ONCE at attach time — constant
    * ≤2¹⁵-row broadcast state per batch): an ingest-time benchmark
    * screen, because eval-set text that reaches the corpus poisons
    * every model trained on it. The screen is a Bloom, so it can
    * OVER-drop (deterministic FPs, measured in SCALING.md) but never
    * under-drop — the correct polarity for a contamination gate.
    */
  def processBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      indexPath: String, stats: CurateStats,
      benchBits: Option[DataFrame] = None,
      benchMBits: Int = Curation.BloomBits): Unit =
    if (batchId > stats.dedup.lastCommitted) {
      graft.functions.GraftFunctions.register(batch.sparkSession)
      val canon = batch
        .withColumn("text", Curation.normalizeText(col("text")))
        .persist()
      try {
        val nRaw = canon.count()
        val gated = TextAnalysis.qualityFilter(canon)
        val (screened, nDropped) = benchBits match {
          case None => (gated, 0L)
          case Some(bits) =>
            val g = gated.persist()
            val out = g.join(
              Curation.bloomFlagged(g, bits, benchMBits),
              Seq("doc_id"), "left_anti")
              .persist()
            // materialize before unpersisting the gated parent; the
            // dropped count is gate-survivors minus screen-survivors
            val kept = out.count()
            val dropped = g.count() - kept
            g.unpersist()
            (out, dropped)
        }
        try {
          DedupStream.processBatch(screened,
            batchId, corpusPath, indexPath, stats.dedup)
          // counters advance only AFTER the delegate returns (the
          // commit-then-count discipline every stream here follows): a
          // failing batch throws out of the line above, so a same-driver
          // retry can never double-count seen. An all-gated batch
          // returns without committing (nothing to write) — still
          // exactly one seen.add, since no exception means no retry.
          stats.seen.add(nRaw)
          stats.decontamDropped.add(nDropped)
        } finally {
          if (benchBits.isDefined) { screened.unpersist(); () }
        }
      } finally { canon.unpersist(); () }
    }

  /** Attach the curation ingest to a documents stream; `benchmark`
    * docs (if any) are folded into a Bloom ONCE here and screened
    * against every batch.
    */
  def start(stream: DataFrame, corpusPath: String, indexPath: String,
      checkpointDir: String, stats: CurateStats,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      benchmark: Option[DataFrame] = None,
      benchMBits: Int = Curation.BloomBits): StreamingQuery = {
    // train-once: persist the position table so per-batch screens
    // broadcast its CACHED rows, not the benchmark's plan. (Not a
    // collected LocalRelation: embedding ~10⁵ literal rows in every
    // batch's three join plans cost ~8× throughput — the planner
    // re-serializes and re-optimizes the literal table per broadcast.)
    // mBits is the sizing dial (SCALING.md "Bloom decontam screen"):
    // build and probe MUST agree on it. The cache lives for the
    // stream's life — filter-sized (≤ mBits rows), the point of Bloom.
    val bits = benchmark.map { b =>
      val t = Curation.bloomBits(b, benchMBits).persist()
      t.count() // materialize once, before the first batch
      t
    }
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, corpusPath, indexPath, stats,
          bits, benchMBits)
      }
      .start()
  }
}
