package graft.agent

import scala.jdk.CollectionConverters._
import scala.util.Try

/** O2 — the LLM-response parser as pure string→struct logic (reference:
  * agent/decision_agent.py:247-344; behavior pinned by
  * tests/test_agent.py:258-301). The LLM call itself is an external
  * dependency the reference treats as optional (its rule-based path is
  * the tested contract, [[DecisionEngine]]); the parser is portable
  * logic: section splitting on short ALL-CAPS-colon headers, JSON tool
  * calls fished out of the ACTIONS section, a confidence clamp, and a
  * substring escalation flag.
  *
  * One deliberate divergence, documented rather than copied: the
  * reference's own test asserts `_extract_confidence("95%") == 95.0`
  * while its implementation clamps to [0, 1] (decision_agent.py:334 —
  * the test comment even says "Will be clamped"). The implementation is
  * the contract we pin: 95 clamps to 1.0.
  */
object ResponseParser {

  /** Structured decision result (reference DecisionResult minus the
    * post-execution `actions_taken`, which tool execution fills).
    */
  final case class ParsedDecision(
    decision: String,
    reasoning: String,
    actions: Seq[Map[String, Any]],
    confidence: Double,
    escalationRequired: Boolean)

  private val FallbackDecision =
    "Error in decision making - manual review required"

  /** Split a response into lowercase-keyed sections. A line is a header
    * iff (trimmed) it ends with ':' and is shorter than 20 chars —
    * reference decision_agent.py:296-316 (its `.upper()` before
    * `endswith(':')` is a no-op on ':'; kept as plain endsWith).
    */
  def extractSections(response: String): Map[String, String] = {
    val sections = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var current: Option[String] = None
    val content = scala.collection.mutable.ArrayBuffer.empty[String]
    def flush(): Unit = current.foreach { s =>
      sections(s.toLowerCase) = content.mkString("\n")
    }
    response.split("\n", -1).foreach { raw =>
      val line = raw.trim
      if (line.endsWith(":") && line.length < 20) {
        flush()
        current = Some(line.dropRight(1))
        content.clear()
      } else if (current.isDefined) {
        content += line
      }
    }
    flush()
    sections.toMap
  }

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parseJsonObject(s: String): Option[Map[String, Any]] =
    Try {
      jsonMapper.readValue(s, classOf[java.util.Map[String, Any]])
        .asScala.toMap
    }.toOption

  /** Extract `{...}` tool calls from the ACTIONS section: every
    * non-nested brace group that parses as a JSON object, with the
    * reference's single-quote repair retry (decision_agent.py:318-330).
    */
  def extractActions(actionsText: String): Seq[Map[String, Any]] =
    "\\{[^}]+\\}".r.findAllIn(actionsText).toSeq.flatMap { m =>
      parseJsonObject(m).orElse(parseJsonObject(m.replace('\'', '"')))
    }

  /** First decimal number in the text, clamped to [0, 1]; 0.5 when no
    * number is present (decision_agent.py:332-339).
    */
  def extractConfidence(confidenceText: String): Double =
    "\\d+\\.?\\d*".r.findFirstIn(confidenceText)
      .flatMap(n => Try(n.toDouble).toOption)
      .map(c => math.min(math.max(c, 0.0), 1.0))
      .getOrElse(0.5)

  /** Escalation iff the text contains "true" case-insensitively
    * (decision_agent.py:341-343).
    */
  def extractEscalation(escalationText: String): Boolean =
    escalationText.toLowerCase.contains("true")

  /** Full response → [[ParsedDecision]], with the reference's defaults
    * per missing section and its total-failure fallback
    * (decision_agent.py:247-280).
    */
  def parseResponse(response: String): ParsedDecision =
    Try {
      val sections = extractSections(response)
      ParsedDecision(
        decision = sections.getOrElse("decision", "No decision made").trim,
        reasoning =
          sections.getOrElse("reasoning", "No reasoning provided").trim,
        actions = extractActions(sections.getOrElse("actions", "")),
        confidence = extractConfidence(sections.getOrElse("confidence", "0.7")),
        escalationRequired =
          extractEscalation(sections.getOrElse("escalation", "false")))
    }.getOrElse(ParsedDecision(
      decision = FallbackDecision,
      reasoning = "Failed to parse LLM response",
      actions = Seq.empty,
      confidence = 0.0,
      escalationRequired = true))
}
