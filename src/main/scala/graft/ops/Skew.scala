package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation patterns (100 TB posture, SURVEY.md §7 risk register).
  *
  * AQE's skew-join split handles shuffle-join skew automatically; these
  * helpers cover the cases it does not: a skewed *aggregation* key, and a
  * skewed *broadcastable* join where one probe key dominates.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. The hot key's rows spread over `salts`
    * partitions in phase 1, so no single task owns the whole key; the
    * phase-2 input is `salts` rows per key — tiny. Result is identical
    * to a direct count (pinned in spec).
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("n"))

  /** Salted distinct-count: phase 1 dedupes (key, value) within salt
    * shards (map-side combine keeps hot keys bounded), phase 2 merges.
    * Exact, unlike approx_count_distinct; use the approx form when ±2 %
    * suffices at 100 TB.
    */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("v"),
        pmod(hash(value), lit(salts)).as("__salt"))
      .groupBy("key", "__salt")
      .agg(countDistinct(col("v")).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("n_distinct"))
}
