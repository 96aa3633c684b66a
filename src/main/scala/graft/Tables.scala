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
  /** `events.ts` has shipped in two fixture formats, so the loader branches
    * on the loaded type rather than assuming one:
    *
    *   - current fixtures: plain TIMESTAMP(MICROS) without the UTC flag,
    *     which Spark 4 loads as TIMESTAMP_NTZ. Cast to session-TZ
    *     TimestampType — all callers (Verify/RunPipeline/Bench) pin the
    *     session to UTC, so the naive instants line up 1:1 with DuckDB's
    *     native-TIMESTAMP oracle arithmetic.
    *   - legacy fixtures: TIMESTAMP(NANOS), which Spark 4 rejects unless
    *     `nanosAsLong` is set (runtime-settable, so it works under any
    *     driver-created session); the column then loads as LongType nanos
    *     and is converted to µs via integer division (`div`, not `/` —
    *     double math would lose precision on ~1.7e18 nanos).
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case TimestampType          => raw
      case TimestampNTZType       => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType | IntegerType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as unsupported type $other; expected timestamp or integral nanos")
    }
  }
  def documents: DataFrame  = t("documents")
  /** `label` ships as INT32 in the fixture; canonicalize to BIGINT at
    * the load boundary so every downstream query output carries the
    * suite's single integer type (SchemaCanonSpec) — the oracle mirrors
    * cast at their own scan sites.
    */
  def embeddings: DataFrame = {
    import org.apache.spark.sql.functions.col
    t("embeddings").withColumn("label", col("label").cast("long"))
  }
}

object Tables {
  /** Spread an under-partitioned input across the session's cores —
    * for TARGETED use directly ahead of heavy per-row compute, not as
    * a blanket loader step.
    *
    * The driver fixtures ship each table as ONE parquet file with ONE
    * row group — unsplittable below the row group, so every map-side
    * pipeline over it (tokenize, shingle, hash, codec decode, partial
    * aggregation) runs in a single task until the first exchange.
    * This is the guide's "one huge unsplittable file" input-skew case;
    * the fix it names is a repartition immediately after the read.
    *
    * Measured discipline (r17 A/B at sf0.1 local[32]): spreading EVERY
    * scan was a net LOSS (16-query subset 14.7 s → 18.4 s) — the extra
    * exchange serializes the full text payload through one map task,
    * which costs more than the unlocked parallelism for cheap
    * pipelines. It pays only where ≥ roughly 0.7 s of single-task
    * compute follows (dsir_weights 1.05→0.67 s, dup_span_top
    * 1.19→0.90 s in the same A/B). Hence: call sites opt in.
    *
    * Scale posture: GUARDED — input already carrying at least
    * `spark.graft.scanSpreadMin` partitions (default: the session's
    * default parallelism) is returned untouched, so on production
    * inputs (files ≫ cores) this is a no-op. Set the conf to 0 to
    * disable. Round-robin keeps the spread uniform; Spark's
    * sort-before-repartition keeps the row-to-partition assignment
    * deterministic under task retry.
    */
  def spreadSmallScan(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.conf.getOption("spark.graft.scanSpreadMin")
      .map(_.toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    if (target <= 0 || df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
