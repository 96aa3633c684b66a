package graft.ops

/** O6 payload formats — the reference's notification channel shapes
  * (ops/notifications.py:41-346) as PURE functions producing the exact
  * JSON / message-header structures. The network transports (webhook
  * POST, SMTP) stay behind the injected [[PipelineRun.Notifier]] — this
  * module is the part a harness CAN pin byte-for-byte: severity → color
  * mapping, Slack attachment layout, email headers/priority, and the
  * three alert composers (pipeline failure, DQ issue with its
  * rate-derived severity ladder, schema drift).
  *
  * JSON is emitted with sorted-stable field order and minimal escaping so
  * specs can assert full payloads; timestamps are injected by the caller
  * (`asOf`) — nothing here reads a clock.
  */
object Notifications {

  /** Severity → Slack attachment color (notifications.py:63-68). */
  val ColorMap: Map[String, String] = Map(
    "info" -> "#36a64f", // green
    "warning" -> "#ffaa00", // orange
    "error" -> "#ff0000", // red
    "critical" -> "#8b0000") // dark red

  def colorFor(severity: String): String =
    ColorMap.getOrElse(severity.toLowerCase, "#36a64f")

  /** The reference's timestamp rendering (notifications.py:86). */
  def renderTs(asOf: java.time.Instant): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss 'UTC'")
      .withZone(java.time.ZoneOffset.UTC)
      .format(asOf)

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jfield(title: String, value: String, short: Boolean): String =
    s"""{"title": ${jstr(title)}, "value": ${jstr(value)}, """ +
      s""""short": $short}"""

  /** The Slack webhook payload (notifications.py:73-103): title text +
    * one severity-colored attachment with Severity/Timestamp/Message
    * fields and the robot footer; `channel` appended only when given.
    */
  def slackPayload(message: String, title: String = "Data Pipeline Alert",
      severity: String = "info", channel: Option[String] = None,
      asOf: java.time.Instant = java.time.Instant.EPOCH): String = {
    val fields = Seq(
      jfield("Severity", severity.toUpperCase, short = true),
      jfield("Timestamp", renderTs(asOf), short = true),
      jfield("Message", message, short = false)).mkString(", ")
    val attachment =
      s"""{"color": ${jstr(colorFor(severity))}, "fields": [$fields], """ +
        s""""footer": "Data Pipeline Orchestrator", """ +
        s""""footer_icon": ":robot_face:"}"""
    val channelPart =
      channel.fold("")(c => s""", "channel": ${jstr(c)}""")
    s"""{"text": ${jstr(title)}, "attachments": [$attachment]$channelPart}"""
  }

  /** Email message head + body (notifications.py:162-174): subject gains
    * the `[SEVERITY]` prefix, X-Priority 1 for error/critical else 3,
    * and the body gains the trailing timestamp line.
    */
  final case class Email(subject: String, from: String, to: String,
    xPriority: String, body: String)

  def emailMessage(subject: String, body: String, to: String,
      severity: String = "info",
      from: String = "pipeline@dataeng.local",
      asOf: java.time.Instant = java.time.Instant.EPOCH): Email =
    Email(
      subject = s"[${severity.toUpperCase}] $subject",
      from = from,
      to = to,
      xPriority =
        if (Set("error", "critical")(severity.toLowerCase)) "1" else "3",
      body = s"$body\n\nTimestamp: ${renderTs(asOf)}")

  /** Pipeline-failure alert composition (notifications.py:233-265):
    * title from the capitalized component, message = component + error +
    * optional context lines, severity fixed at error.
    */
  def pipelineFailure(errorMessage: String, component: String,
      context: Seq[(String, String)] = Nil): (String, String, String) = {
    val title = s"Pipeline Failure - ${component.capitalize}"
    val parts = Seq(s"Component: $component", s"Error: $errorMessage") ++
      (if (context.nonEmpty)
        "Additional Context:" +: context.map { case (k, v) => s"  $k: $v" }
      else Nil)
    (title, parts.mkString("\n"), "error")
  }

  /** DQ-issue severity ladder (notifications.py:296-304): failure rate
    * >10 % critical, >5 % error, >1 % warning, else info.
    */
  def dqSeverity(affected: Long, total: Long): String = {
    val rate = if (total > 0) affected.toDouble / total * 100 else 0.0
    if (rate > 10) "critical"
    else if (rate > 5) "error"
    else if (rate > 1) "warning"
    else "info"
  }

  /** DQ-issue alert composition (notifications.py:267-310). */
  def dataQualityIssue(issueType: String, affected: Long, total: Long,
      details: Option[String] = None): (String, String, String) = {
    val rate = if (total > 0) affected.toDouble / total * 100 else 0.0
    val prettyType = issueType.split('_').map(_.capitalize).mkString(" ")
    def grouped(n: Long): String =
      String.format(java.util.Locale.US, "%,d",
        java.lang.Long.valueOf(n)) // locale-pinned thousands grouping
    val parts = Seq(
      s"Issue Type: $issueType",
      s"Affected Records: ${grouped(affected)} out of ${grouped(total)}",
      f"Failure Rate: $rate%.2f%%") ++ details.map(d => s"Details: $d")
    (s"Data Quality Issue - $prettyType", parts.mkString("\n"),
      dqSeverity(affected, total))
  }

  /** Schema-drift alert composition (notifications.py:312-346). */
  def schemaDrift(newFields: Seq[String] = Nil,
      removedFields: Seq[String] = Nil, typeChanges: Option[String] = None,
      version: Option[Int] = None): (String, String, String) = {
    val parts = Seq("Schema evolution detected in incoming data:") ++
      (if (newFields.nonEmpty)
        Seq(s"New Fields: ${newFields.mkString(", ")}") else Nil) ++
      (if (removedFields.nonEmpty)
        Seq(s"Removed Fields: ${removedFields.mkString(", ")}") else Nil) ++
      typeChanges.map(t => s"Type Changes: $t") ++
      version.map(v => s"Schema Version: $v")
    ("Schema Drift Detected", parts.mkString("\n"), "warning")
  }
}
