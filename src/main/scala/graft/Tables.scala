package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Each accessor is a plain `spark.read.parquet` — Catalyst gets full
  * pushdown/pruning on these scans, so callers should select/filter
  * declaratively and let the scan shrink.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in the fixture parquet, which Spark 4
    * rejects by default. Read it as long nanos (runtime-settable legacy
    * conf, so this works under any driver-created session) and convert to a
    * µs TimestampType via integer division (`div`, not `/` — double math
    * would lose precision on ~1.7e18 nanos).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
