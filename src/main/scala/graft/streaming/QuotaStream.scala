package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source admission quota — the streaming twin of
  * [[graft.ext.Curation.sourceCap]]: admit at most `cap` documents per
  * source across the whole stream, tracked in keyed state. A batch cap
  * can keep the N BEST docs per source because it sees the corpus; a
  * stream cannot see the future, so the streaming contract is
  * arrival-order admission (first `cap` win) — the quality-ranked
  * re-cap runs in the batch layer over the admitted corpus, the same
  * lambda split as [[DedupStream]] (candidate-level stream screen,
  * verified batch pass).
  *
  * Scale: state is ONE long per source (admitted count), sharded across
  * executors by the group key — millions of sources is megabytes of
  * state; emitted admissions are the input stream, map-side tagged.
  * Within a batch, rows apply in `doc_id` order so replays of the same
  * batch contents are deterministic. NoTimeout: source quotas are
  * corpus-lifetime by design (a production variant keyed to crawl epoch
  * would use event-time timeout to reset per epoch).
  */
object QuotaStream {

  final case class DocArrival(doc_id: Long, source: String)

  final case class SourceQuota(admitted: Long)

  final case class Admission(doc_id: Long, source: String,
    admitted: Boolean, n_admitted_after: Long)

  /** Tag every arrival with its admission verdict and the source's
    * post-decision admitted count. Works identically over a batch or
    * streaming Dataset (batch = one big micro-batch with empty state).
    */
  def admissions(docs: DataFrame, cap: Int): Dataset[Admission] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .map { case (id, src) => DocArrival(id, src) }
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[DocArrival],
         state: GroupState[SourceQuota]) =>
          val sorted = rows.toSeq.sortBy(_.doc_id)
          var n = state.getOption.map(_.admitted).getOrElse(0L)
          val out = sorted.map { d =>
            val ok = n < cap
            if (ok) n += 1
            Admission(d.doc_id, src, ok, n)
          }
          state.update(SourceQuota(n))
          out.iterator
      }
  }
}
