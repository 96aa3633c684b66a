package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.{CorpusGraph, Dedup}

/** Streaming corpus-graph maintenance: each micro-batch of documents
  * `(doc_id, text, …)` lands (1) the docs in the corpus, (2) their
  * MinHash band rows in the stored band index, and (3) their near-dup
  * PAIR EVIDENCE in the persisted corpus graph — batch↔corpus cross
  * pairs via [[Dedup.incrementalNearDups]] against the accumulated
  * band index, batch-internal pairs via [[Dedup.minhashNearDups]] over
  * the batch's own bands, then [[CorpusGraph.append]]'s bounded
  * touched-component relabel.
  *
  * This is the EVIDENCE-PRESERVING twin of [[DedupStream]]: that leg
  * DROPS near-dups at ingest (keep-first), which is right when the
  * corpus must stay deduplicated online; this leg keeps every doc and
  * records the duplicate evidence as graph edges, which is right when
  * survivor policy is decided downstream (keep-best, source-priority —
  * the `dedup_survivor_policies` matrix) or when clusters themselves
  * are the product (evidence-ranked collapse lists, manifest
  * provenance). Same per-batch cost shape: banding + candidate
  * verification against candidates only, never corpus × corpus.
  *
  * Idempotence: corpus and band writes land under their own batch_id
  * partitions (the [[BatchIndex]] contract); the graph append is
  * replay-idempotent by [[CorpusGraph.append]]'s own pin (its pair
  * write rewrites exactly its batch partition and its relabel is a
  * fixed point on replay). Stream batch ids are offset by one — 0 is
  * reserved for batch base builds (the [[SearchStream]] rule).
  *
  * Verification needs document TEXT on both sides of a candidate pair,
  * so the cross-pair screen reads candidate docs back from the stored
  * corpus — pruned to the candidates' doc-id buckets, bounded by
  * evidence volume, never a corpus rescan.
  *
  * Layout note: the stream's corpus is (bucket, batch_id)-partitioned
  * for exactly that pruned read-back; a corpus written by a different
  * layout version cannot be mixed in place (Spark rejects conflicting
  * partition structures) — migrate with a one-time re-bucket rewrite
  * before resuming the checkpoint.
  */
object GraphStream {

  final class GraphStats(spark: org.apache.spark.sql.SparkSession)
      extends Serializable {
    val seen = spark.sparkContext.longAccumulator("graph_seen")
    val pairs = spark.sparkContext.longAccumulator("graph_pairs")
    val resent = spark.sparkContext.longAccumulator("graph_resent")
    @volatile var lastCommitted: Long = -1L
  }

  private val BandCols = Seq("doc_id", "band_idx", "band_hash")

  /** Doc-id-bucket count for the stream's corpus layout: candidate
    * verification needs candidate docs' TEXT back from the stored
    * corpus, and an unpruned read would rescan the whole corpus every
    * trigger — so the corpus lands under (bucket, batch_id) and the
    * read prunes to the candidates' buckets (≤ min(candidates,
    * buckets) partitions; the [[graft.ext.Multimodal.MediaFpBuckets]]
    * sizing rule).
    */
  val CorpusBuckets = 16L

  /** One idempotent micro-batch ingest (the foreachBatch body of
    * [[start]], extracted so StreamingSpec can replay it).
    */
  def processBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      bandIndexPath: String, graphPath: String,
      stats: GraphStats): Unit =
    // release-everything scratch scope: a micro-batch's plans are
    // unique per trigger, so every persist here (the batch bands below
    // AND the library-internal candidate/shingle/delta persists inside
    // incrementalNearDups / CorpusGraph.append) has zero cross-batch
    // reuse value — without the scope they would accrete cache+disk
    // blocks for the stream's lifetime
    if (batchId > stats.lastCommitted) graft.ext.Scratch.scopedAll {
      val spark = batch.sparkSession
      val storedId = batchId + 1 // 0 is reserved for batch base builds
      val cached = batch.persist()
      try {
        val nSeen = cached.count()
        if (nSeen == 0) return
        val batchBands = graft.ext.Scratch.track(
          Dedup.bandTable(cached).persist())
        // pruned index read: only the band buckets this batch's hashes
        // hit (the [[DedupStream.BandBuckets]] layout) — every use
        // below is an equi-join on (band_idx, band_hash) or a probe
        // for ids sharing those hashes, so rows in other buckets
        // cannot contribute. Persisted for the trigger (scopedAll
        // releases it): the candidate-bucket discovery, the
        // re-sent-id probe, and incrementalNearDups' candidate join
        // all read this one pruned scan.
        val hitBandBuckets = batchBands
          .select(DedupStream.bandBucket.as("band_bucket")).distinct()
          .collect().map(_.getLong(0)).toSeq
        val indexBands = graft.ext.Scratch.track(
          BatchIndex.readBeforeBuckets(spark, bandIndexPath,
            storedId, BandCols, batchBands.limit(0),
            "band_bucket", hitBandBuckets).persist())
        // re-sent ids: a doc_id already in the stored band index has
        // been ingested — screening it again would put the SAME doc on
        // both sides of incrementalNearDups, whose shingle union then
        // doubles its rows and inflates every jaccard it touches
        // (2i/(2na+nb−2i) — borderline non-dups would enter the graph
        // as false pair evidence), and it would land a second corpus
        // row. Drop such rows: their evidence already exists. (Bands
        // are a pure function of text, so an identical re-send always
        // collides with its own stored rows; a CHANGED text under a
        // reused doc_id is an upstream contract violation — doc ids
        // are immutable identities here.)
        val resentIds = graft.ext.Scratch.track(indexBands
          .join(broadcast(cached.select("doc_id").distinct()),
            Seq("doc_id"), "left_semi")
          .select("doc_id").distinct().persist())
        val nResent = resentIds.count()
        val fresh =
          if (nResent == 0L) cached
          else graft.ext.Scratch.track(cached
            .join(broadcast(resentIds), Seq("doc_id"), "left_anti")
            .persist())
        val freshBands =
          if (nResent == 0L) batchBands
          else graft.ext.Scratch.track(batchBands
            .join(broadcast(resentIds), Seq("doc_id"), "left_anti")
            .persist())
        // corpus side of candidate verification: the band join names
        // the candidate index docs FIRST (hash-sized tables), their
        // bucket set prunes the corpus read to ≤ min(candidates,
        // buckets) partitions, and the replay-excluding batch_id
        // filter keeps a recovery replay from screening against its
        // own first attempt — per-trigger corpus IO is candidate-
        // bucket-sized, never a full corpus rescan
        val candBuckets = indexBands
          .join(broadcast(freshBands
            .select("band_idx", "band_hash").distinct()),
            Seq("band_idx", "band_hash"))
          .select(pmod(col("doc_id"), lit(CorpusBuckets)).as("bucket"))
          .distinct().collect().map(_.getLong(0)).toSeq
        val corpusBefore =
          if (candBuckets.isEmpty) cached.limit(0)
          else
            try spark.read.parquet(corpusPath)
              .filter(col("bucket").isin(candBuckets: _*) // pruning
                && col("batch_id") < storedId)
              .select(cached.columns.map(col).toIndexedSeq: _*)
            catch {
              case e: org.apache.spark.sql.AnalysisException
                  if e.getCondition != null
                    && (e.getCondition.contains("PATH_NOT_FOUND")
                      || e.getCondition.contains(
                        "UNABLE_TO_INFER_SCHEMA")) =>
                cached.limit(0)
            }
        val cross = Dedup.incrementalNearDups(
            corpusBefore, fresh, indexBands = Some(indexBands))
          .filter(col("batch_doc") =!= col("index_doc")) // belt+braces
          .select(least(col("batch_doc"), col("index_doc")).as("doc_a"),
            greatest(col("batch_doc"), col("index_doc")).as("doc_b"))
        val internal = Dedup.minhashNearDups(fresh,
            bands = Some(freshBands))
          .select("doc_a", "doc_b")
        val batchPairs = cross.unionByName(internal)
          .withColumn("modality", lit("text"))
        // EVERY fresh doc lands (evidence-preserving — no near-dup
        // drops; only exact id re-sends are deduplicated), bucketed
        // for the pruned read-back above; pairs and relabel go
        // through the graph's own idempotent append
        BatchIndex.writePartition(
          fresh.withColumn("bucket",
            pmod(col("doc_id"), lit(CorpusBuckets))),
          storedId, corpusPath, bucketCol = Some("bucket"))
        BatchIndex.writePartition(
          freshBands.withColumn("band_bucket", DedupStream.bandBucket),
          storedId, bandIndexPath, bucketCol = Some("band_bucket"))
        val nPairs = batchPairs.persist().count()
        try CorpusGraph.append(spark, graphPath, batchPairs, storedId)
        finally { batchPairs.unpersist(); () }
        stats.seen.add(nSeen)
        stats.resent.add(nResent)
        stats.pairs.add(nPairs)
        stats.lastCommitted = batchId
        ()
      } finally { cached.unpersist(); () }
    }

  /** Attach the graph-maintenance ingest to a document stream. */
  def start(stream: DataFrame, corpusPath: String, bandIndexPath: String,
      graphPath: String, checkpointDir: String, stats: GraphStats,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"))
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, corpusPath, bandIndexPath,
          graphPath, stats)
      }
      .start()
}
