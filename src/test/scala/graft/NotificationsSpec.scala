package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Notifications

/** Pins the notification payload shapes to the reference's
  * (ops/notifications.py:41-346): Slack attachment JSON, severity
  * colors, email headers, and the three alert composers including the
  * DQ failure-rate severity ladder.
  */
class NotificationsSpec extends AnyFunSuite {

  private val t0 = java.time.Instant.parse("2024-01-02T03:04:05Z")

  test("slack payload carries the severity-colored attachment layout") {
    val p = Notifications.slackPayload("disk full", "Ops Alert",
      "error", Some("#data-alerts"), t0)
    assert(p == """{"text": "Ops Alert", "attachments": """ +
      """[{"color": "#ff0000", "fields": [{"title": "Severity", """ +
      """"value": "ERROR", "short": true}, {"title": "Timestamp", """ +
      """"value": "2024-01-02 03:04:05 UTC", "short": true}, """ +
      """{"title": "Message", "value": "disk full", "short": false}], """ +
      """"footer": "Data Pipeline Orchestrator", """ +
      """"footer_icon": ":robot_face:"}], "channel": "#data-alerts"}""")
    // no channel -> no channel key; unknown severity -> green default
    val q = Notifications.slackPayload("m", "T", "odd", None, t0)
    assert(!q.contains("\"channel\"") && q.contains("#36a64f"))
    // message content is escaped into valid JSON
    val esc = Notifications.slackPayload("line1\n\"quoted\"", "T",
      "info", None, t0)
    assert(esc.contains("line1\\n\\\"quoted\\\""))
  }

  test("severity colors match the reference map") {
    assert(Notifications.colorFor("info") == "#36a64f")
    assert(Notifications.colorFor("WARNING") == "#ffaa00")
    assert(Notifications.colorFor("error") == "#ff0000")
    assert(Notifications.colorFor("critical") == "#8b0000")
  }

  test("email message: severity subject prefix, priority, timestamp") {
    val m = Notifications.emailMessage("Load failed", "details here",
      "oncall@example.com", "critical", asOf = t0)
    assert(m.subject == "[CRITICAL] Load failed")
    assert(m.xPriority == "1")
    assert(m.from == "pipeline@dataeng.local")
    assert(m.body == "details here\n\nTimestamp: 2024-01-02 03:04:05 UTC")
    assert(Notifications.emailMessage("s", "b", "t", "info").xPriority
      == "3")
    assert(Notifications.emailMessage("s", "b", "t", "warning").xPriority
      == "3")
  }

  test("pipeline failure composer") {
    val (title, msg, sev) = Notifications.pipelineFailure(
      "broker unreachable", "kafka",
      Seq("topic" -> "customer-events", "attempt" -> "3"))
    assert(title == "Pipeline Failure - Kafka")
    assert(sev == "error")
    assert(msg == Seq("Component: kafka", "Error: broker unreachable",
      "Additional Context:", "  topic: customer-events",
      "  attempt: 3").mkString("\n"))
  }

  test("DQ issue composer and its failure-rate severity ladder") {
    assert(Notifications.dqSeverity(0, 1000) == "info")
    assert(Notifications.dqSeverity(10, 1000) == "info") // 1% not > 1
    assert(Notifications.dqSeverity(11, 1000) == "warning")
    assert(Notifications.dqSeverity(50, 1000) == "warning") // 5% not > 5
    assert(Notifications.dqSeverity(51, 1000) == "error")
    assert(Notifications.dqSeverity(100, 1000) == "error") // 10% not > 10
    assert(Notifications.dqSeverity(101, 1000) == "critical")
    assert(Notifications.dqSeverity(5, 0) == "info") // no totals
    val (title, msg, sev) = Notifications.dataQualityIssue(
      "validation_failure", 1234, 56789, Some("null emails"))
    assert(title == "Data Quality Issue - Validation Failure")
    assert(sev == "warning") // 2.17%
    assert(msg == Seq("Issue Type: validation_failure",
      "Affected Records: 1,234 out of 56,789",
      "Failure Rate: 2.17%", "Details: null emails").mkString("\n"))
  }

  test("SlackPayloadNotifier renders the full payload for run-cycle alerts") {
    val payloads = scala.collection.mutable.Buffer.empty[String]
    val n = new graft.ops.PipelineRun.SlackPayloadNotifier(
      payloads += _, clock = () => t0)
    n.notify("error", "late rate 20%")
    assert(payloads.size == 1)
    assert(payloads.head == Notifications.slackPayload("late rate 20%",
      "Data Pipeline Alert", "error", None, t0))
    assert(payloads.head.contains("#ff0000")) // severity color applied
  }

  test("schema drift composer") {
    val (title, msg, sev) = Notifications.schemaDrift(
      newFields = Seq("marketing_opt_in", "customer_segment"),
      version = Some(3))
    assert(title == "Schema Drift Detected" && sev == "warning")
    assert(msg == Seq("Schema evolution detected in incoming data:",
      "New Fields: marketing_opt_in, customer_segment",
      "Schema Version: 3").mkString("\n"))
  }
}
