package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dq.DqSuite
import graft.enrich.Enrich
import graft.ops.Incidents
import graft.report.Reports

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a named operator from SURVEY.md §2 with a
  * DuckDB-equivalent in [[oracleSql]]. Conventions for oracle parity:
  *   - deterministic ORDER BY on a unique key in both engines;
  *   - timestamps exposed as epoch seconds/millis BIGINT (no tz ambiguity);
  *   - doubles rounded (2dp money sums, 6dp rates/averages);
  *   - conditional counts via count(CASE/when) so both sides emit BIGINT.
  */
object SparkEntry {

  private def tables(spark: SparkSession, dir: String) = Tables(spark, dir)

  /** Flagship: full curated CustomerEvent pipeline on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Enrich.curated(Tables(spark, "/root/testdata/sf0.001").events)

  // ---- shared projections -------------------------------------------------

  /** Deterministic, oracle-comparable projection of the curated frame. */
  private def ceCurated(spark: SparkSession, dir: String): DataFrame =
    Enrich.curated(tables(spark, dir).events).select(
      col("event_id"), col("id"), col("name"), col("email"), col("country"),
      col("plan"), col("version"), col("marketing_opt_in"),
      col("customer_segment"), col("signup_ts"), col("event_ts"),
      unix_timestamp(col("signup_timestamp")).as("signup_ts_sec"),
      unix_timestamp(col("event_timestamp")).as("event_ts_sec"),
      unix_millis(col("processing_timestamp")).as("processing_ts_ms"),
      col("region"), col("email_domain"), col("customer_age_days"),
      col("schema_drift_detected"), col("is_late_arrival"),
      col("dq_email_valid"), col("dq_id_not_null"),
      col("dq_timestamp_valid"), col("dq_plan_valid"), col("dq_passed")
    ).orderBy("event_id")

  // ---- driver contract ----------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3/S5 + P1-P7 + Q1-Q5: the reference job's full transform chain
    "ce_curated" -> ((s, dir) => ceCurated(s, dir)),

    // A1-A3: run report (ingest_transform.py:307-336)
    "ce_run_report" -> ((s, dir) =>
      Reports.runReportWithRates(Enrich.curated(tables(s, dir).events))),

    // P3 at scale: region via broadcast dim join, then aggregate
    "region_counts" -> ((s, dir) =>
      Enrich.curated(tables(s, dir).events)
        .groupBy("region")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("id")).as("n_customers"))
        .orderBy("region")),

    // Headline scan+agg (TPC-H Q1 pattern) on lineitem
    "q1_lineitem_agg" -> ((s, dir) =>
      tables(s, dir).lineitem
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // A4: incident stats by type over trailing 7d window
    "incident_stats_by_type" -> ((s, dir) =>
      Incidents.statsByType(
        Incidents.fromEvents(tables(s, dir).events), Incidents.defaultCutoff)
        .orderBy("incident_type")),

    // S8: recent incidents, newest first, limit 10
    "incident_recent" -> ((s, dir) =>
      Incidents.recent(Incidents.fromEvents(tables(s, dir).events))
        .select(col("incident_id"), col("incident_type"), col("severity"),
          col("status"), col("escalated"),
          unix_millis(col("created_at")).as("created_at_ms"))),

    // E1-E15: GE suite, one-pass evaluation (SURVEY.md §2.3)
    "dq_suite_results" -> ((s, dir) =>
      DqSuite.evaluate(Enrich.curated(tables(s, dir).events),
        DqSuite.customersSuite).orderBy("exp_idx")),

    // A5: suite summary + threshold banding (dq_rules.yml:85-89)
    "dq_suite_summary" -> ((s, dir) =>
      DqSuite.summarize(DqSuite.evaluate(
        Enrich.curated(tables(s, dir).events), DqSuite.customersSuite))),

    // Quality dimension scores (dq_rules.yml:91-106)
    "dq_dimension_scores" -> ((s, dir) =>
      DqSuite.dimensionScores(DqSuite.evaluate(
        Enrich.curated(tables(s, dir).events), DqSuite.customersSuite))
        .orderBy("dimension")),

    // A8: daily quality-score trend slope (tests/test_dq.py:358-375)
    "dq_trend_daily" -> ((s, dir) => {
      val daily = Enrich.curated(tables(s, dir).events)
        .groupBy(to_date(col("processing_timestamp")).as("day"))
        .agg(avg(when(col("dq_passed"), 1.0).otherwise(0.0)).as("rate"))
      daily.agg(
        round((max_by(col("rate"), col("day"))
          - min_by(col("rate"), col("day"))) / count(lit(1)), 6).as("trend"),
        count(lit(1)).as("n_days"))
    })
  )

  // ---- oracles ------------------------------------------------------------

  private val W = CustomerEvents.sqlWith // WITH ce, cur0, cur

  def oracleSql: Map[String, String] = Map(
    "ce_curated" ->
      s"""$W
         |SELECT event_id, id, name, email, country, plan, version,
         |  marketing_opt_in, customer_segment, signup_ts, event_ts,
         |  CAST(floor(epoch_ms(signup_timestamp) / 1000.0) AS BIGINT)
         |    AS signup_ts_sec,
         |  CAST(floor(epoch_ms(event_timestamp) / 1000.0) AS BIGINT)
         |    AS event_ts_sec,
         |  epoch_ms(processing_timestamp) AS processing_ts_ms,
         |  region, email_domain, customer_age_days, schema_drift_detected,
         |  is_late_arrival, dq_email_valid, dq_id_not_null,
         |  dq_timestamp_valid, dq_plan_valid, dq_passed
         |FROM cur ORDER BY event_id""".stripMargin,

    "ce_run_report" ->
      s"""$W
         |SELECT total_records, late_records, dq_failures, schema_drift_count,
         |  CASE WHEN total_records > 0
         |    THEN round(CAST(late_records AS DOUBLE) / total_records, 6)
         |    ELSE 0.0 END AS late_rate,
         |  CASE WHEN total_records > 0
         |    THEN round(CAST(dq_failures AS DOUBLE) / total_records, 6)
         |    ELSE 0.0 END AS dq_failure_rate
         |FROM (
         |  SELECT count(*) AS total_records,
         |    count(CASE WHEN is_late_arrival THEN 1 END) AS late_records,
         |    count(CASE WHEN NOT dq_passed THEN 1 END) AS dq_failures,
         |    count(CASE WHEN schema_drift_detected THEN 1 END)
         |      AS schema_drift_count
         |  FROM cur)""".stripMargin,

    "region_counts" ->
      s"""$W
         |SELECT region, count(*) AS n_events,
         |  count(DISTINCT id) AS n_customers
         |FROM cur GROUP BY region ORDER BY region""".stripMargin,

    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "incident_stats_by_type" ->
      s"""WITH incidents AS (${Incidents.sqlCte})
         |SELECT incident_type, count(*) AS n,
         |  count(CASE WHEN escalated THEN 1 END) AS n_escalated
         |FROM incidents
         |WHERE created_at >= TIMESTAMP '2024-02-01 00:00:00'
         |  - INTERVAL 7 DAY
         |GROUP BY incident_type ORDER BY incident_type""".stripMargin,

    "incident_recent" ->
      s"""WITH incidents AS (${Incidents.sqlCte})
         |SELECT incident_id, incident_type, severity, status, escalated,
         |  epoch_ms(created_at) AS created_at_ms
         |FROM incidents
         |ORDER BY created_at DESC, incident_id LIMIT 10""".stripMargin,

    "dq_suite_results" ->
      s"""$W, results AS (${DqSuite.resultsSql(DqSuite.customersSuite)})
         |SELECT * FROM results ORDER BY exp_idx""".stripMargin,

    "dq_suite_summary" ->
      s"""$W, results AS (${DqSuite.resultsSql(DqSuite.customersSuite)})
         |SELECT *,
         |  CASE WHEN failure_rate > ${DqSuite.CriticalThreshold}
         |         THEN 'critical'
         |       WHEN failure_rate > ${DqSuite.WarningThreshold}
         |         THEN 'warning'
         |       ELSE 'acceptable' END AS band,
         |  (failure_rate > ${DqSuite.HardFailThreshold}) AS hard_fail
         |FROM (
         |  SELECT *,
         |    round(successful_expectations * 100.0
         |      / evaluated_expectations, 4) AS success_percent,
         |    round(CAST(unsuccessful_expectations AS DOUBLE)
         |      / evaluated_expectations, 6) AS failure_rate
         |  FROM (
         |    SELECT count(*) AS evaluated_expectations,
         |      count(CASE WHEN success THEN 1 END)
         |        AS successful_expectations,
         |      count(CASE WHEN NOT success THEN 1 END)
         |        AS unsuccessful_expectations
         |    FROM results))""".stripMargin,

    "dq_dimension_scores" -> {
      val dims = DqSuite.Dimensions
        .flatMap { case (d, idxs) => idxs.map(i => s"('$d', $i)") }
        .mkString(", ")
      s"""$W, results AS (${DqSuite.resultsSql(DqSuite.customersSuite)})
         |SELECT dimension, round(avg(success_rate), 6) AS score
         |FROM results
         |JOIN (VALUES $dims) AS dims(dimension, exp_idx) USING (exp_idx)
         |GROUP BY dimension ORDER BY dimension""".stripMargin
    },

    "dq_trend_daily" ->
      s"""$W, daily AS (
         |  SELECT CAST(processing_timestamp AS DATE) AS day,
         |    avg(CASE WHEN dq_passed THEN 1.0 ELSE 0.0 END) AS rate
         |  FROM cur GROUP BY 1)
         |SELECT round((max_by(rate, day) - min_by(rate, day))
         |    / count(*), 6) AS trend,
         |  count(*) AS n_days
         |FROM daily""".stripMargin
  )
}
