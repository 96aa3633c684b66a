package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.CustomerEvents.asOfCol

/** The ops-side `incidents` table re-expressed as a Spark DataFrame
  * (SURVEY.md §1.5, §2.8 O7) — reference keeps it in SQLite
  * (ops/incident_store.py:41-57) with stats queries at
  * incident_store.py:316-371; here incidents are derived deterministically
  * from `error` events so the same stats are oracle-verifiable.
  *
  * Derivation (documented contract, mirrored in SQL by
  * [[graft.SparkEntry.oracleSql]]): one incident per error event;
  * incident_type from the event value band; severity/status/escalated from
  * event_id residues.
  */
object Incidents {

  val Types = Seq("pipeline_failure", "late_arrival", "schema_drift", "data_quality")
  val Severities = Seq("low", "medium", "high", "critical")
  val Statuses = Seq("open", "investigating", "resolved")

  /** events → incidents frame: (incident_id, incident_type, severity,
    * status, escalated, created_at).
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val v = col("value"); val eid = col("event_id")
    events.filter(col("event_type") === "error").select(
      concat(lit("inc_"), eid.cast("string")).as("incident_id"),
      when(v >= 150, "data_quality").when(v >= 100, "schema_drift")
        .when(v >= 50, "late_arrival").otherwise("pipeline_failure")
        .as("incident_type"),
      when(eid % 4 === 0, "low").when(eid % 4 === 1, "medium")
        .when(eid % 4 === 2, "high").otherwise("critical").as("severity"),
      when(eid % 3 === 0, "open").when(eid % 3 === 1, "investigating")
        .otherwise("resolved").as("status"),
      // severity >= high auto-escalates (ops/incident_store.py:81-114 policy)
      (eid % 4 >= 2).as("escalated"),
      col("ts").as("created_at"))
  }

  /** The same derivation in DuckDB SQL, CTE body named `incidents`. */
  val sqlCte: String = """
    SELECT
      'inc_' || CAST(event_id AS VARCHAR) AS incident_id,
      CASE WHEN value >= 150 THEN 'data_quality'
           WHEN value >= 100 THEN 'schema_drift'
           WHEN value >= 50 THEN 'late_arrival'
           ELSE 'pipeline_failure' END AS incident_type,
      CASE event_id % 4 WHEN 0 THEN 'low' WHEN 1 THEN 'medium'
           WHEN 2 THEN 'high' ELSE 'critical' END AS severity,
      CASE event_id % 3 WHEN 0 THEN 'open' WHEN 1 THEN 'investigating'
           ELSE 'resolved' END AS status,
      (event_id % 4 >= 2) AS escalated,
      ts AS created_at
    FROM events
    WHERE event_type = 'error'"""

  /** A4 — incident stats group-bys over a trailing window
    * (incident_store.py:316-371): counts by incident_type.
    */
  def statsByType(incidents: DataFrame, cutoff: Column): DataFrame =
    incidents.filter(col("created_at") >= cutoff)
      .groupBy("incident_type")
      .agg(count(lit(1)).as("n"),
        count(when(col("escalated"), 1)).as("n_escalated"))

  /** S8 — recent incidents, newest first, decision-context window of 10
    * (ops/incident_store.py:200-234; config.yml:55).
    */
  def recent(incidents: DataFrame, limit: Int = 10): DataFrame =
    incidents.orderBy(desc("created_at"), col("incident_id")).limit(limit)

  def defaultCutoff: Column = asOfCol - expr("INTERVAL 7 DAYS")

  /** O7 read-modify-write semantics without a transactional store
    * (SURVEY.md §7 risk register): incidents are an append-only log of
    * state versions; "update" = append a new version row. Updates here
    * are derived deterministically (event_id % 3 updates, hourly apart,
    * status cycling) so the DuckDB oracle reproduces the log.
    */
  def updateLog(incidents0: DataFrame): DataFrame = {
    val withEid = incidents0
      .withColumn("eid",
        regexp_extract(col("incident_id"), "inc_(\\d+)", 1).cast("long"))
    withEid
      .select(col("incident_id"), col("incident_type"), col("severity"),
        col("escalated"), col("created_at"), col("eid"),
        explode(sequence(lit(0), col("eid") % 3)).as("update_seq"))
      .select(col("incident_id"), col("incident_type"), col("severity"),
        // status advances one step per update
        when((col("eid") + col("update_seq")) % 3 === 0, "open")
          .when((col("eid") + col("update_seq")) % 3 === 1, "investigating")
          .otherwise("resolved").as("status"),
        // escalation latches once severity is high/critical and an update lands
        (col("escalated") || (col("update_seq") > 0
          && col("severity").isin("high", "critical"))).as("escalated"),
        timestamp_micros(unix_micros(col("created_at"))
          + col("update_seq") * 3600000000L).as("updated_at"),
        col("update_seq"))
  }

  /** Latest-state view over the append log: last-write-wins snapshot via
    * row_number over (incident_id, updated_at desc) — the standard
    * pattern for mutable entities on immutable storage; at 100 TB this is
    * exactly a compaction job.
    */
  def latestState(log: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("incident_id")
      .orderBy(col("updated_at").desc, col("update_seq").desc)
    log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .drop("rn")
  }

  /** SCD2 history view over the append log: each state version becomes a
    * validity interval `[valid_from, valid_to)` with `valid_to` = the next
    * version's timestamp (NULL on the current version) — the standard
    * slowly-changing-dimension type-2 shape warehouses build over mutable
    * entities on immutable storage, and the temporal complement of
    * [[latestState]] (which keeps only the open interval).
    *
    * Scale shape: one window pass partitioned by incident_id — the same
    * single shuffle latestState pays; no self-join (the naive
    * formulation joins the log to itself on version adjacency).
    */
  def history(log: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("incident_id")
      .orderBy(col("updated_at"), col("update_seq"))
    log
      .withColumn("valid_from", col("updated_at"))
      .withColumn("valid_to", lead(col("updated_at"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** DuckDB mirror of [[history]] (expects `log`). */
  val historySql: String = """
    SELECT *, updated_at AS valid_from,
      lead(updated_at) OVER (
        PARTITION BY incident_id ORDER BY updated_at, update_seq)
        AS valid_to,
      (lead(updated_at) OVER (
        PARTITION BY incident_id ORDER BY updated_at, update_seq) IS NULL)
        AS is_current
    FROM log"""

  /** O7 at scale: the append log on immutable storage grows without
    * bound and [[latestState]] re-reads all of it. Compaction rewrites a
    * log parquet directory down to its latest-state rows; the compacted
    * log is ITSELF a valid append log (exactly one current version row
    * per incident), so readers keep using [[latestState]] unchanged over
    * `compacted ∪ post-compaction appends` while read amplification
    * resets to one row per incident. Runs as snapshot-to-temp then two
    * directory renames (atomic on local FS / HDFS), so a crash leaves
    * either the old log, or the new log, or the old log renamed aside
    * (recoverable) — never a partially deleted mix; on an object store
    * the swap would be a manifest commit instead. Returns
    * (rowsBefore, rowsAfter). Equivalence of the compacted read path is
    * pinned in AgentSpec.
    */
  def compactLog(spark: org.apache.spark.sql.SparkSession,
      logDir: String): (Long, Long) = {
    val log = spark.read.parquet(logDir)
    val before = log.count()
    val tmp = new org.apache.hadoop.fs.Path(logDir + ".compacting")
    latestState(log).write.mode("overwrite").parquet(tmp.toString)
    val after = spark.read.parquet(tmp.toString).count()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(logDir)
    val old = new org.apache.hadoop.fs.Path(logDir + ".pre-compaction")
    fs.delete(old, true)
    require(fs.rename(live, old), s"could not stage $live aside")
    require(fs.rename(tmp, live), s"could not promote $tmp")
    fs.delete(old, true)
    (before, after)
  }

  /** DuckDB mirror: the update log CTE body (expects `incidents`). */
  val updateLogSql: String = """
    SELECT incident_id, incident_type, severity,
      CASE (eid + update_seq) % 3 WHEN 0 THEN 'open'
           WHEN 1 THEN 'investigating' ELSE 'resolved' END AS status,
      (escalated OR (update_seq > 0
        AND severity IN ('high', 'critical'))) AS escalated,
      make_timestamp(epoch_us(created_at)
        + update_seq * 3600000000) AS updated_at,
      update_seq
    FROM (
      SELECT *, CAST(regexp_extract(incident_id, 'inc_(\d+)', 1) AS BIGINT)
        AS eid
      FROM incidents),
      unnest(range(0, eid % 3 + 1)) AS u(update_seq)"""
}
