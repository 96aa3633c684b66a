package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}

/** Scale probe ("measure, don't guess"): synthesize an N-doc corpus with
  * planted near-dups entirely as column expressions (no fixture bound),
  * then time the heavy ext operators at increasing N. Results recorded
  * in SCALING.md.
  *
  * `sbt "runMain graft.ScaleProbe 50000 200000"`
  */
object ScaleProbe {

  /** Deterministic word-salad corpus: ~55-word docs over a 30-word
    * vocabulary; ids ≡ 1 (mod 17) mirror the previous id's text with one
    * word changed (planted near-dup pairs, like the fixtures).
    */
  def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    val vocab = array((0 until 30).map(i => lit(s"w$i")): _*)
    // ids ≡ 1 (mod 17) share the previous id's seed -> planted pairs
    val seed = when(col("id") % 17 === 1, col("id") - 1).otherwise(col("id"))
    val words = transform(sequence(lit(1), lit(40) + pmod(seed, lit(30))),
      i => element_at(vocab,
        (pmod(xxhash64(seed, i), lit(30)) + 1).cast("int")))
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(array_join(words, " "),
        when(col("id") % 17 === 1, concat(lit(" tail"), col("id")))
          .otherwise(lit(""))).as("text"),
      lit("en").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(50000L, 200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- sizes) {
      val docs = synthDocs(spark, n).persist()
      docs.count() // materialize corpus outside the timings
      def time(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(f"[scale] n=$n%-8d $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$rows")
      }
      time("text_stats") { TextAnalysis.textStats(docs).count() }
      time("minhash_near_dups") { Dedup.minhashNearDups(docs).count() }
      time("simhash_near_dups") { Dedup.simhashNearDups(docs).count() }
      time("simhash60_near_dups") { Dedup.simhash60NearDups(docs).count() }
      time("exact_dedup") { Dedup.exactSummary(docs).count() }
      docs.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
