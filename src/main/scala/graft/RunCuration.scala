package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Curation, Dedup, TextAnalysis}

/** Runnable corpus→training-mix pipeline over the fixtures — the CLI
  * surface of the curation operators composed in execution order
  * (`sbt "runMain graft.RunCuration [sfDir] [outDir]"`):
  *
  *   canonicalize (NFC + ws + case) → named-rule quality gate →
  *   MinHash near-dup removal → PII scrub → stratified sample →
  *   train/val/test split → sequence-pack plan → BPE merge table,
  *
  * writing the curated corpus (parquet, partitioned by split) plus the
  * audit artifacts a data team would keep: per-rule gate report, split
  * summary, pack plan, learned merges. Every stage is the same operator
  * the verified queries pin — this main only sequences them.
  */
object RunCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_curation")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val docs = Tables(spark, sfDir).documents
    val nRaw = docs.count()

    val canon = docs
      .withColumn("text", Curation.normalizeText(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val gated = TextAnalysis.qualityFilter(canon)
    val nGated = gated.count()

    val drops = Dedup.minhashDropSet(gated)
      .withColumn("__dup", lit(1))
    val deduped = gated.join(broadcast(drops), Seq("doc_id"), "left")
      .filter(col("__dup").isNull).drop("__dup")
    val nDeduped = deduped.count()

    val scrubbed = deduped
      .withColumn("text", Curation.scrubPii(col("text")))
    val sampled = Curation.stratifiedSample(scrubbed)
      .withColumn("split", Curation.splitName(col("doc_id")))
    val nSampled = sampled.count()

    sampled.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")
    TextAnalysis.qualityFilterReport(canon).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/quality_report")
    Curation.datasetSplitSummary(sampled.drop("split")).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/split_summary")
    Curation.packPlan(sampled).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/pack_plan")
    Bpe.mergesTable(sampled).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/bpe_merges")

    println(s"[curation] raw=$nRaw gated=$nGated deduped=$nDeduped " +
      s"sampled=$nSampled out=$outDir")
    spark.stop()
  }
}
