package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** O5 — quarantine split (SURVEY.md §2.5/§2.8). The reference only records
  * a filter condition and leaves "actual record movement … to Spark job"
  * (reference: agent/tools.py:136-177, comment at :163); this implements
  * the declared operator: one predicate, two flows.
  *
  * Both sides derive from the same plan, so with the input cached (or in
  * foreachBatch, where the batch is already materialized) this costs one
  * scan; each flow is written to its own sink partition-parallel.
  */
object Quarantine {

  /** (main flow, quarantined flow). `cond` selects BAD records. */
  def split(df: DataFrame, cond: Column): (DataFrame, DataFrame) =
    (df.filter(!coalesce(cond, lit(false))),
      df.filter(coalesce(cond, lit(false))))

  /** Both flows as one tagged frame (for inspection queries/sinks). */
  def tagged(df: DataFrame, cond: Column): DataFrame =
    df.withColumn("flow",
      when(coalesce(cond, lit(false)), "quarantine").otherwise("main"))

  /** Replay: re-admit quarantined rows that are NOT in the bad-key set —
    * the left_anti exclusion the reference implies for re-processing.
    */
  def replay(main: DataFrame, quarantined: DataFrame,
      badKeys: DataFrame, key: String): DataFrame =
    main.unionByName(
      quarantined.join(badKeys, Seq(key), "left_anti"))
}
