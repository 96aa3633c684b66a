package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-health introspection: the numbers an operator team reads
  * BEFORE picking a partitioning strategy at 100 TB. Pure derived
  * statistics — one map-side-combinable count per key, a 1-row totals
  * broadcast, and a TakeOrdered top-K; cost is one scan regardless of
  * corpus size.
  */
object Diagnostics {

  /** A key is salting-worthy when it carries over 10× the mean
    * per-key volume (skew_x1000 > 10000) — the same order AQE's
    * skewedPartitionFactor defaults target; crossing it means one
    * task owns 10× the work of its peers on that shuffle.
    */
  val SkewSaltThresholdX1000 = 10000L

  /** Per-key skew report for a prospective shuffle key: top-K keys by
    * row count with exact-integer ppm share, skew multiple vs the mean
    * key (×1000), and the salting recommendation. All ratios are
    * integer `div` — bit-identical cross-engine.
    */
  def keySkewReport(df: DataFrame, key: String, topK: Int = 20)
      : DataFrame = {
    val counts = df.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = broadcast(counts.agg(
      sum("n").cast("long").as("n_total"),
      count(lit(1)).as("n_keys")))
    counts.crossJoin(totals)
      .withColumn("share_ppm", expr("n * 1000000 div n_total"))
      .withColumn("skew_x1000", expr("n * 1000 * n_keys div n_total"))
      .withColumn("salt_recommended",
        col("skew_x1000") > SkewSaltThresholdX1000)
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
      .select("key", "n", "share_ppm", "skew_x1000",
        "salt_recommended", "n_total", "n_keys")
  }

  /** DuckDB mirror of [[keySkewReport]] over a named table/key. */
  def keySkewReportSql(table: String, key: String, topK: Int = 20)
      : String =
    s"""WITH counts AS MATERIALIZED (
       |  SELECT $key AS key, count(*) AS n FROM $table GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS n_total,
       |    count(*) AS n_keys FROM counts)
       |SELECT key, n, n * 1000000 // n_total AS share_ppm,
       |  n * 1000 * n_keys // n_total AS skew_x1000,
       |  n * 1000 * n_keys // n_total > $SkewSaltThresholdX1000
       |    AS salt_recommended,
       |  n_total, n_keys
       |FROM counts CROSS JOIN totals
       |ORDER BY n DESC, key LIMIT $topK""".stripMargin
}
