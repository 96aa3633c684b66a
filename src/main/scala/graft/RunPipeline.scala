package graft

import org.apache.spark.sql.SparkSession

import graft.enrich.Enrich
import graft.ops.PipelineRun

/** Runnable O8 cycle over the fixtures — the library's CLI twin of the
  * reference's per-DAG-run batch (`sbt "runMain graft.RunPipeline
  * [sfDir] [opsDir] [sinkDir]"`): curate -> sink+report -> DQ -> decide
  * (console notifications) -> validate -> cleanup, artifacts under
  * opsDir.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val opsDir = args.lift(1).getOrElse("/tmp/graft_ops")
    val sinkDir = args.lift(2).getOrElse("/tmp/graft_sink")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val curated = Enrich.curated(Tables(spark, sfDir).events)
    val out = PipelineRun.run(curated, opsDir, sinkDir,
      PipelineRun.ConsoleNotifier,
      new PipelineRun.RecordingTrigger)
    println(s"[pipeline] report=${out.report} dqFailureRate=${out.dqFailureRate}")
    println(s"[pipeline] decision=${out.decision.decision} " +
      s"confidence=${out.decision.confidence} " +
      s"escalate=${out.decision.escalationRequired}")
    println(s"[pipeline] validation=${out.validation} cleaned=${out.cleanedUp}")
    spark.stop()
  }
}
