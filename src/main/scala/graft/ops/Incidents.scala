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
}
