package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.Enrich
import graft.ops.PipelineRun
import graft.ops.PipelineRun._

/** Full orchestrated cycle over sf0.001 (O8 stage contract with artifact
  * files, O3/O6 side-effect recording, O9 validation, O10 retention).
  */
class PipelineRunSpec extends AnyFunSuite {
  import SparkTestSession._

  test("one pipeline cycle: artifacts, decision, validation, cleanup") {
    val opsDir = Files.createTempDirectory("ops").toString
    val sinkDir = Files.createTempDirectory("sink").toString + "/out"
    val notifier = new RecordingNotifier
    val trigger = new RecordingTrigger

    // plant an old quarantine file for the retention stage
    val qDir = Paths.get(s"$opsDir/quarantine")
    Files.createDirectories(qDir)
    val oldFile = qDir.resolve("stale.parquet")
    Files.writeString(oldFile, "x")
    Files.setLastModifiedTime(oldFile,
      java.nio.file.attribute.FileTime.from(
        Instant.now().minusSeconds(30L * 86400)))

    val curated = Enrich.curated(Tables(spark, Sf0001).events)
    val outcome = PipelineRun.run(curated, opsDir, sinkDir, notifier,
      trigger)

    // artifacts written per the DAG file contract
    Seq("run_report.json", "ge_results.json", "agent_decision.json",
        "kafka_monitoring.json")
      .foreach(f => assert(Files.exists(Paths.get(s"$opsDir/$f")), f))
    // monitor stage derives health from the batch, not a hardcoded stub
    val mon = Files.readString(Paths.get(s"$opsDir/kafka_monitoring.json"))
    assert(mon.contains("\"status\": \"healthy\"")
      && mon.contains(s""""n_records": ${outcome.report.totalRecords}"""))
    // report numbers agree with a direct aggregate
    assert(outcome.report.totalRecords == curated.count())
    // fixture has injected DQ failures > 5% -> escalation path, notified
    assert(outcome.decision.escalationRequired)
    assert(notifier.sent.nonEmpty)
    // sink validated: rows match, hive partition dirs exist
    assert(outcome.validation.ok)
    assert(outcome.validation.rowCount == outcome.report.totalRecords)
    assert(outcome.validation.fileCount > 0)
    // retention deleted the stale file
    assert(outcome.cleanedUp == 1)
    assert(!Files.exists(oldFile))
    // artifacts are re-readable through the engine (S7)
    val rep = PipelineRun.readReport(spark, s"$opsDir/run_report.json")
    assert(rep.select("total_records").head().getLong(0)
      == outcome.report.totalRecords)
  }

  test("healthy data: continue, no side effects, no DQ hard-fail") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val opsDir = Files.createTempDirectory("ops2").toString
    val sinkDir = Files.createTempDirectory("sink2").toString + "/out"
    val notifier = new RecordingNotifier
    val trigger = new RecordingTrigger
    // suite-clean events: unique ids, names present, valid domains, fresh
    val eventTs = 1706745000000L // 2024-01-31 23:50 UTC, 10 min pre-asOf
    val parsed = (1 to 20).map { i =>
      s"""{"id":"c$i","name":"n$i","email":"u$i@example.com",
         |"signup_ts":${eventTs - 90L * 86400000L},"country":"US",
         |"plan":"basic","event_ts":$eventTs,"version":1}"""
        .stripMargin.replaceAll("\n", "")
    }.toDF("value")
    val curated = graft.streaming.EventPipeline.curate(
      graft.streaming.EventPipeline.parse(parsed),
      to_timestamp(lit("2024-02-01 00:00:00")))
    val outcome = PipelineRun.run(curated, opsDir, sinkDir, notifier,
      trigger)
    assert(outcome.decision.decision == "continue")
    assert(outcome.executed.isEmpty)
    assert(notifier.sent.isEmpty)
    assert(trigger.triggered.isEmpty)
    assert(!outcome.dqHardFail)
    assert(outcome.dqFailureRate == 0.0)
  }
}
