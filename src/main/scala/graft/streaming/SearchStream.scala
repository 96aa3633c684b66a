package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Search

/** Streaming search-index ingest: the streaming twin of
  * [[graft.ext.Search.appendToSearchIndex]]. Each micro-batch
  * tokenizes ONLY its own documents — the accumulated index is never
  * read or reshuffled — and lands its postings under (bucket,
  * batch_id) and its doc lengths under (batch_id) in the SAME
  * artifact the batch builders write, with dynamic partition
  * overwrite, so an at-least-once replay rewrites exactly its own
  * partitions (the [[EventPipeline.processBatch]] idempotence
  * contract). Term/phrase search AND BM25 see stream-ingested docs
  * transparently: the readers scan every batch_id level.
  *
  * Spark's micro-batch ids start at 0; the stored batch_id is offset by
  * one because 0 is reserved for the base build.
  */
object SearchStream {

  /** One idempotent micro-batch ingest (the foreachBatch body of
    * [[start]], extracted so StreamingSpec can replay it).
    */
  def processBatch(batch: DataFrame, batchId: Long,
      indexPath: String): Unit =
    Search.appendToSearchIndex(batch, indexPath, batchId + 1)

  /** Attach the postings ingest to a document stream
    * (doc_id, text, ...).
    */
  def start(stream: DataFrame, indexPath: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"))
      : StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, indexPath)
      }
      .start()
}
