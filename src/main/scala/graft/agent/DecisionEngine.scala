package graft.agent

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** O1 — the self-healing pipeline's decision rule engine as a pure Scala
  * function (reference: agent/decision_agent.py:63-70, 432-493; behavior
  * pinned by tests/test_agent.py:125-363). The LLM layer of the reference
  * is optional and its rule-based path is the tested contract — that is
  * what we implement; tool side-effects (Airflow retrigger, Slack/email)
  * stay behind the [[Action]] ADT for the caller to execute.
  *
  * [[decisionColumns]] is the same rule set as Catalyst Column
  * expressions, so decisions can run *inside* Spark over billions of
  * per-partition/per-day run reports — at 100 TB "decide per slice" is a
  * projection, not a driver loop. A ScalaCheck spec pins both forms to
  * each other.
  */
object DecisionEngine {

  /** Thresholds (reference: agent/decision_agent.py:63-70). */
  val LateRateThreshold = 0.15
  val DqFailureRateThreshold = 0.05
  val ConsecutiveFailureThreshold = 3
  val ConfidenceGate = 0.7

  final case class PipelineContext(
    totalRecords: Long, lateRecords: Long, dqFailures: Long,
    schemaDriftCount: Long, consecutiveFailures: Int = 0,
    runReportAvailable: Boolean = true) {
    def lateRate: Double =
      if (totalRecords == 0) 0.0 else lateRecords.toDouble / totalRecords
    def dqFailureRate: Double =
      if (totalRecords == 0) 0.0 else dqFailures.toDouble / totalRecords
  }

  sealed trait Action
  final case class RetriggerTask(taskId: String) extends Action
  case object ApplySchemaRemap extends Action
  final case class QuarantineRecords(condition: String) extends Action
  final case class NotifyOps(severity: String, message: String) extends Action
  final case class EscalateIncident(incidentType: String) extends Action

  final case class Decision(
    decision: String, reasoning: Seq[String], actions: Seq[Action],
    confidence: Double, escalationRequired: Boolean)

  /** The rule cascade. Order and outcomes mirror the reference's
    * `_rule_based_decision` (decision_agent.py:432-493):
    * missing inputs → investigate+escalate; late>15% → escalate;
    * DQ>5% → quarantine+escalate; drift → auto-remap (additive policy,
    * no escalation — README.md:113-122); 3+ consecutive failures →
    * retrigger+escalate; else healthy continue.
    */
  def decide(ctx: PipelineContext): Decision = {
    if (!ctx.runReportAvailable)
      return Decision("investigate",
        Seq("run report missing — cannot assess pipeline health"),
        Seq(NotifyOps("high", "run report missing"),
          EscalateIncident("pipeline_failure")),
        confidence = 0.5, escalationRequired = true)

    val reasons = Seq.newBuilder[String]
    val actions = Seq.newBuilder[Action]
    var escalate = false

    if (ctx.lateRate > LateRateThreshold) {
      reasons += f"late-arrival rate ${ctx.lateRate}%.3f > $LateRateThreshold"
      actions += NotifyOps("high", "late arrival surge")
      actions += EscalateIncident("late_arrival")
      escalate = true
    }
    if (ctx.dqFailureRate > DqFailureRateThreshold) {
      reasons += f"DQ failure rate ${ctx.dqFailureRate}%.3f > $DqFailureRateThreshold"
      actions += QuarantineRecords("NOT dq_passed")
      actions += NotifyOps("high", "data-quality failures above threshold")
      actions += EscalateIncident("data_quality")
      escalate = true
    }
    if (ctx.schemaDriftCount > 0) {
      reasons += s"schema drift on ${ctx.schemaDriftCount} records (additive) — auto-remap"
      actions += ApplySchemaRemap
    }
    if (ctx.consecutiveFailures >= ConsecutiveFailureThreshold) {
      reasons += s"${ctx.consecutiveFailures} consecutive failures"
      actions += RetriggerTask("run_spark_job")
      actions += EscalateIncident("pipeline_failure")
      escalate = true
    }

    val rs = reasons.result()
    if (rs.isEmpty)
      Decision("continue", Seq("pipeline healthy"), Nil, 0.9,
        escalationRequired = false)
    else {
      // confidence decreases as independent problems compound
      // (compound-failure scenario, tests/test_agent.py:335-363)
      val conf = math.max(0.5, 0.9 - 0.1 * (rs.size - 1))
      Decision(if (escalate) "remediate_and_escalate" else "auto_remediate",
        rs, actions.result(), conf, escalate)
    }
  }

  /** Confidence gate (decision_agent.py:69, execute path 346-384):
    * actions run only when confidence ≥ 0.7; escalation always surfaces.
    */
  def actionsToExecute(d: Decision): Seq[Action] =
    if (d.confidence >= ConfidenceGate) d.actions else Nil

  /** The identical rule set as Column expressions over a frame bearing
    * total_records / late_records / dq_failures / schema_drift_count /
    * consecutive_failures. Returns (decision, escalation_required,
    * n_actions, confidence) columns.
    */
  def decisionColumns: Seq[Column] = {
    val total = col("total_records")
    val lateRate = when(total > 0,
      col("late_records").cast("double") / total).otherwise(0.0)
    val dqRate = when(total > 0,
      col("dq_failures").cast("double") / total).otherwise(0.0)
    val lateBad = lateRate > LateRateThreshold
    val dqBad = dqRate > DqFailureRateThreshold
    val drift = col("schema_drift_count") > 0
    val consec = col("consecutive_failures") >= ConsecutiveFailureThreshold
    val escalate = lateBad || dqBad || consec
    val nReasons = lateBad.cast("int") + dqBad.cast("int") +
      drift.cast("int") + consec.cast("int")
    val nActions = lateBad.cast("int") * 2 + dqBad.cast("int") * 3 +
      drift.cast("int") + consec.cast("int") * 2
    val decision = when(nReasons === 0, "continue")
      .when(escalate, "remediate_and_escalate").otherwise("auto_remediate")
    val confidence = when(nReasons === 0, 0.9)
      .otherwise(greatest(lit(0.5), lit(0.9) - lit(0.1) * (nReasons - 1)))
    Seq(decision.as("decision"), escalate.as("escalation_required"),
      nActions.cast("long").as("n_actions"), confidence.as("confidence"))
  }

  /** Derive `consecutive_failures` for a per-day run-stats frame
    * (columns: day, total_records, late_records, dq_failures, …): the
    * number of immediately-preceding days whose run hard-failed, where a
    * hard-fail day is one breaching the late-rate or DQ-rate threshold —
    * the same conditions that escalate, so the streak feeds the
    * reference's escalate-after-3 rule (agent/decision_agent.py:66) with
    * real history instead of a constant.
    *
    * Gaps-and-islands over the ordered day sequence: a running count of
    * healthy days labels each fail-island; the running fail-count within
    * an island is the streak *through* each day; the previous day's
    * streak is this day's `consecutive_failures` (a healthy previous day
    * carries streak 0, resetting the counter). All windows run over the
    * per-day aggregate — O(days) rows — so the single-partition sort is
    * bounded regardless of input scale.
    */
  def withConsecutiveFailures(daily: DataFrame): DataFrame = {
    val byDay = Window.orderBy("day")
    val lateRate = when(col("total_records") > 0,
      col("late_records").cast("double") / col("total_records"))
      .otherwise(0.0)
    val dqRate = when(col("total_records") > 0,
      col("dq_failures").cast("double") / col("total_records"))
      .otherwise(0.0)
    daily
      .withColumn("__fail",
        lateRate > LateRateThreshold || dqRate > DqFailureRateThreshold)
      .withColumn("__grp", sum(when(!col("__fail"), 1L).otherwise(0L))
        .over(byDay.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__streak", sum(col("__fail").cast("long"))
        .over(Window.partitionBy("__grp").orderBy("day")))
      .withColumn("consecutive_failures",
        coalesce(lag(col("__streak"), 1).over(byDay), lit(0L)))
      .drop("__fail", "__grp", "__streak")
  }

  /** DuckDB mirror of [[withConsecutiveFailures]]: CTE chain from a
    * per-day aggregate CTE named `daily` to `with_consec` carrying the
    * same five stat columns plus `consecutive_failures`.
    */
  def consecutiveFailuresSql: String = {
    val lateRate =
      "(CASE WHEN total_records > 0 THEN CAST(late_records AS DOUBLE) / total_records ELSE 0.0 END)"
    val dqRate =
      "(CASE WHEN total_records > 0 THEN CAST(dq_failures AS DOUBLE) / total_records ELSE 0.0 END)"
    s"""flagged AS (
       |  SELECT *, ($lateRate > $LateRateThreshold
       |    OR $dqRate > $DqFailureRateThreshold) AS fail
       |  FROM daily),
       |grp AS (
       |  SELECT *, sum(CASE WHEN NOT fail THEN 1 ELSE 0 END)
       |    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS g
       |  FROM flagged),
       |streaks AS (
       |  SELECT *, sum(CASE WHEN fail THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY g ORDER BY day) AS streak
       |  FROM grp),
       |with_consec AS (
       |  SELECT day, total_records, late_records, dq_failures,
       |    schema_drift_count,
       |    CAST(coalesce(lag(streak) OVER (ORDER BY day), 0) AS BIGINT)
       |      AS consecutive_failures
       |  FROM streaks)""".stripMargin
  }

  /** DuckDB mirror of [[decisionColumns]] as SQL select-list items over
    * the same column names.
    */
  def decisionSql: String = {
    val lateRate =
      "(CASE WHEN total_records > 0 THEN CAST(late_records AS DOUBLE) / total_records ELSE 0.0 END)"
    val dqRate =
      "(CASE WHEN total_records > 0 THEN CAST(dq_failures AS DOUBLE) / total_records ELSE 0.0 END)"
    val lateBad = s"($lateRate > $LateRateThreshold)"
    val dqBad = s"($dqRate > $DqFailureRateThreshold)"
    val drift = "(schema_drift_count > 0)"
    val consec = s"(consecutive_failures >= $ConsecutiveFailureThreshold)"
    val nReasons = s"(CAST($lateBad AS INT) + CAST($dqBad AS INT) + CAST($drift AS INT) + CAST($consec AS INT))"
    s"""CASE WHEN $nReasons = 0 THEN 'continue'
       |     WHEN $lateBad OR $dqBad OR $consec THEN 'remediate_and_escalate'
       |     ELSE 'auto_remediate' END AS decision,
       |  ($lateBad OR $dqBad OR $consec) AS escalation_required,
       |  CAST(CAST($lateBad AS INT) * 2 + CAST($dqBad AS INT) * 3
       |    + CAST($drift AS INT) + CAST($consec AS INT) * 2 AS BIGINT)
       |    AS n_actions,
       |  CASE WHEN $nReasons = 0 THEN 0.9
       |       ELSE greatest(0.5, 0.9 - 0.1 * ($nReasons - 1)) END
       |    AS confidence""".stripMargin
  }
}
