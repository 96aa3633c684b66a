package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventPipeline

/** Runnable streaming demo without a Kafka broker: the `rate` source
  * synthesizes CustomerEvent payloads (with the reference's anomaly mix
  * via the same residue arithmetic as [[CustomerEvents]]), feeding the
  * full parse -> curate -> watermark -> dual-sink pipeline for a bounded
  * run (`sbt "runMain graft.RunStream [seconds] [outDir] [rowsPerSec]
  * [json|avro]"`). The 4th arg selects the wire format: `json`
  * (from_json path) or `avro` (the producer's actual binary-datum
  * contract through the native codec, [[EventPipeline.parseAvro]]).
  * With a broker, swap the source for [[EventPipeline.fromKafka]] — the
  * rest is unchanged.
  */
object RunStream {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(15)
    val outDir = args.lift(1).getOrElse("/tmp/graft_stream")
    val rowsPerSecond = args.lift(2).getOrElse("200")
    val wire = args.lift(3).getOrElse("json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

    // `dedup` mode: document stream with a planted 10% duplicate rate
    // (every value ≡ 7 (mod 10) repeats the text of value − 7) through
    // the incremental near-dup ingest — measures sustained docs/s of
    // graft.streaming.DedupStream on this box (recorded in SCALING.md)
    if (wire == "dedup") {
      val seed = when(col("value") % 10 === 7, col("value") - 7)
        .otherwise(col("value"))
      val vocab = array((0 until 30).map(i => lit(s"w$i")): _*)
      val words = transform(sequence(lit(1), lit(40) + pmod(seed, lit(30))),
        i => element_at(vocab,
          (pmod(xxhash64(seed, i), lit(30)) + 1).cast("int")))
      val docs = rate.select(col("value").as("doc_id"),
        array_join(words, " ").as("text"))
      val stats = new graft.streaming.DedupStream.DedupStats(spark)
      val q = graft.streaming.DedupStream.start(docs,
        s"$outDir/corpus", s"$outDir/index", s"$outDir/ckpt", stats,
        Trigger.ProcessingTime("5 seconds"))
      EventPipeline.runBounded(q, seconds * 1000L)
      val kept = spark.read.parquet(s"$outDir/corpus").count()
      println(s"[stream-dedup] seen=${stats.seen.value} " +
        s"kept=${stats.kept.value} sink=$kept " +
        f"keptRate=${stats.kept.value.toDouble / math.max(stats.seen.value, 1)}%.4f " +
        f"docsPerSec=${stats.seen.value.toDouble / seconds}%.0f")
      spark.stop()
      return
    }

    val uid = col("value") % 1000
    val nowMs = unix_millis(col("timestamp"))
    val event = struct(
      concat(lit("cust_"), uid.cast("string")).as("id"),
      concat(lit("user_"), uid.cast("string")).as("name"),
      when(col("value") % 53 === 0, "invalid-email")
        .otherwise(concat(lit("u"), uid.cast("string"), lit("@example.com")))
        .as("email"),
      (nowMs - (uid % 730 + 1) * 86400000L).as("signup_ts"),
      when(uid % 10 === 0, "US").when(uid % 10 === 1, "CA")
        .when(uid % 10 === 2, "GB").when(uid % 10 === 3, "DE")
        .otherwise("FR").as("country"),
      when(uid % 5 === 0, "free").when(uid % 5 === 1, "basic")
        .when(uid % 5 === 2, "premium").otherwise("enterprise").as("plan"),
      // 5% late by 1-24h, like the reference's injector
      (nowMs - when(col("value") % 20 === 0,
        (col("value") % 24 + 1) * 3600000L).otherwise(0L)).as("event_ts"),
      when(col("value") % 100 === 0, 2).otherwise(1).as("version"),
      lit(null).cast("boolean").as("marketing_opt_in"),
      lit(null).cast("string").as("customer_segment"))

    graft.functions.GraftFunctions.register(spark)
    val parsed = wire match {
      case "avro" => EventPipeline.parseAvro(rate.select(
        graft.functions.GraftFunctions.avroEncodeCe(event).as("value")))
      case _ => EventPipeline.parse(rate.select(to_json(event).as("value")))
    }
    val stats = new EventPipeline.RunStats(spark)
    val query = EventPipeline.startDualSink(
      EventPipeline.curate(parsed),
      s"$outDir/main", s"$outDir/quarantine", s"$outDir/ckpt", stats,
      Trigger.ProcessingTime("5 seconds"))
    EventPipeline.runBounded(query, seconds * 1000L)

    println(s"[stream] total=${stats.total.value} late=${stats.late.value} " +
      s"dqFailed=${stats.dqFailed.value} drifted=${stats.drifted.value} " +
      f"lateRate=${stats.lateRate}%.4f dqFailureRate=${stats.dqFailureRate}%.4f")
    val written = spark.read.parquet(s"$outDir/main").count()
    val quarantined = spark.read.parquet(s"$outDir/quarantine").count()
    println(s"[stream] sink rows: main=$written quarantine=$quarantined")
    spark.stop()
  }
}
