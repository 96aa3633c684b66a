package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted mergeable-sketch index: per-(day, event_type) DataSketches
  * HLL registers over `user_id`, stored day-partitioned. Any
  * distinct-users question over any day window is then answered by
  * UNIONING the stored sketches — a partition-pruned read of O(days)
  * kilobyte rows; the event corpus is scanned once at build (or one day
  * per ingest), never per query. This is the standard warehouse pattern
  * for distinct-over-arbitrary-window at 100 TB, where exact
  * `count(DISTINCT)` per query would reshuffle the corpus every time.
  *
  * Mergeability is the whole point: HLL register-wise max is
  * associative/commutative, so day sketches roll up to any window,
  * and a day re-ingest just overwrites that day's partition
  * (idempotent replay — the BatchIndex discipline keyed by day).
  */
object SketchIndex {

  /** DataSketches lgConfigK: 2^12 registers ≈ 1.6 % relative standard
    * error — kilobytes per sketch row.
    */
  val LgK = 12

  private def dayOf = expr("unix_millis(ts) div 86400000")

  private def sketchRows(events: DataFrame): DataFrame =
    events.select(dayOf.as("day"), col("event_type"), col("user_id"))
      .groupBy("day", "event_type")
      .agg(hll_sketch_agg(col("user_id"), lit(LgK)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Full build: one corpus scan → day-partitioned sketch table. */
  def writeHllIndex(events: DataFrame, path: String): Unit = {
    val spark = events.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    sketchRows(events)
      .write.mode("overwrite").partitionBy("day").parquet(path)
  }

  /** Incremental ingest: re-sketch ONLY the days present in `batch`
    * (dynamic partition overwrite — replaying a day is idempotent,
    * untouched days keep their files).
    */
  def upsertDays(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    sketchRows(batch)
      .write.mode("overwrite").partitionBy("day").parquet(path)
  }

  /** Served read: distinct-user estimate per event_type over
    * [fromDay, toDay] by unioning the stored sketches. The day filter
    * prunes to the window's partitions; nothing event-sized is read.
    */
  def distinctUsersOverRange(spark: SparkSession, path: String,
      fromDay: Long, toDay: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") >= fromDay && col("day") <= toDay)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("est_distinct"),
        sum("n_events").as("n_events"))

  /** Sketch-vs-exact acceptance band for the verified query: generous
    * vs the 1.6 % RSE so the row only reddens on a real defect.
    */
  val HllRelBound = 0.1

  /** The oracle-checkable form (the `approx_sketches` discipline): the
    * served estimate and the index's event accounting are checked
    * against the exact in-window answers computed from the corpus, and
    * only exact values + the boolean verdicts are emitted. The window
    * is data-derived (days 10–19 after the corpus's first day) so both
    * engines select identical rows with no wall-clock input.
    */
  def hllWindowVerified(spark: SparkSession, events: DataFrame,
      path: String): DataFrame = {
    val days = events.select(dayOf.as("day"), col("event_type"),
      col("user_id"))
    val minDay = days.agg(min("day")).head().getLong(0)
    val (from, to) = (minDay + 10, minDay + 19)
    val served = distinctUsersOverRange(spark, path, from, to)
    val exact = days
      .filter(col("day") >= from && col("day") <= to)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_distinct"),
        count(lit(1)).as("exact_events"))
    served.join(exact, Seq("event_type"))
      .select(col("event_type"), col("exact_distinct"),
        col("exact_events"),
        (col("n_events") === col("exact_events")).as("events_match"),
        (abs(col("est_distinct") - col("exact_distinct"))
          <= lit(HllRelBound) * col("exact_distinct"))
          .as("within_bound"))
      .orderBy("event_type")
  }

  /** DuckDB mirror of [[hllWindowVerified]]: exact in-window answers +
    * literal-true verdicts (the sketch side is what is under test).
    */
  val hllWindowVerifiedSql: String =
    """WITH days AS MATERIALIZED (
      |  SELECT epoch_ms(ts) // 86400000 AS day, event_type, user_id
      |  FROM events),
      |win AS (
      |  SELECT min(day) + 10 AS f, min(day) + 19 AS t FROM days)
      |SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
      |  count(*) AS exact_events,
      |  true AS events_match,
      |  true AS within_bound
      |FROM days CROSS JOIN win
      |WHERE day >= f AND day <= t
      |GROUP BY event_type ORDER BY event_type""".stripMargin
}
