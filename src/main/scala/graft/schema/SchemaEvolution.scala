package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventPipeline

/** Schema evolution & drift handling (SURVEY.md §1.2): the CustomerEvent
  * wire schema is versioned additively — v1 = 8 base fields, v2 adds
  * `marketing_opt_in`, v3 adds `customer_segment` (reference:
  * kafka/producer/produce_events.py:149-164). Drift policy: additive
  * nullable fields auto-remap; breaking changes (type change, dropped
  * required field) quarantine + escalate (reference: README.md:113-122,
  * agent/decision_agent.py:184-186, airflow/include/config.yml:47).
  *
  * This module implements both the *detection* (P8's column-set diff done
  * properly — against the observed schema, not the post-from_json frame
  * where it is dead code, ingest_transform.py:141-154) and the
  * *consumption* of a remap (O4: the `schema_remap.json` the reference
  * agent writes with `applied: false`, agent/tools.py:91-134 — the
  * rename/cast projection that applies it is what the Spark job never
  * implemented).
  */
object SchemaEvolution {

  /** Versioned schemas. v1 strips the two drift fields; v2 adds
    * marketing_opt_in; v3 = full [[EventPipeline.eventSchema]].
    */
  val v3: StructType = EventPipeline.eventSchema
  val v2: StructType =
    StructType(v3.fields.filterNot(_.name == "customer_segment"))
  val v1: StructType =
    StructType(v2.fields.filterNot(_.name == "marketing_opt_in"))

  def schemaFor(version: Int): StructType = version match {
    case 1 => v1
    case 2 => v2
    case _ => v3
  }

  sealed trait Drift
  case object NoDrift extends Drift
  /** New nullable columns only — safe to auto-remap. */
  final case class AdditiveDrift(newColumns: Seq[String]) extends Drift
  /** Type changes / dropped required fields — quarantine + escalate. */
  final case class BreakingDrift(
    missingRequired: Seq[String],
    typeChanged: Seq[(String, DataType, DataType)]) extends Drift

  /** Fields the wire contract marks non-nullable (avsc:8-29,44-51). */
  val RequiredFields = Seq("id", "email", "signup_ts", "event_ts")

  /** P8 done right: classify an observed schema against the expected one.
    * Additive-nullable-only → [[AdditiveDrift]]; anything losing a
    * required field or changing a type → [[BreakingDrift]].
    */
  def classify(observed: StructType,
      expected: StructType = v3): Drift = {
    val obs = observed.fields.map(f => f.name -> f.dataType).toMap
    val exp = expected.fields.map(f => f.name -> f.dataType).toMap
    val newCols = observed.fieldNames.filterNot(exp.contains).toSeq
    val missing = expected.fieldNames.filterNot(obs.contains).toSeq
    val missingRequired = missing.filter(RequiredFields.contains)
    val typeChanged = observed.fields.toSeq.collect {
      case f if exp.contains(f.name) && exp(f.name) != f.dataType =>
        (f.name, exp(f.name), f.dataType)
    }
    if (missingRequired.nonEmpty || typeChanged.nonEmpty)
      BreakingDrift(missingRequired, typeChanged)
    else if (newCols.nonEmpty) AdditiveDrift(newCols)
    else NoDrift
  }

  /** A remap entry: source column → (target name, target type). Mirrors
    * the reference's schema_remap.json shape (field_mappings + casts).
    */
  final case class Remap(from: String, to: String, castTo: Option[DataType])

  /** O4 consumption — apply a remap as a single projection: renames,
    * casts, and null-backfill of expected-but-absent nullable columns, so
    * any vN frame conforms to the target schema. Pure column expressions;
    * at 100 TB this is a free map-side projection.
    */
  def applyRemap(df: DataFrame, remaps: Seq[Remap],
      target: StructType = v3): DataFrame = {
    val renamed = remaps.foldLeft(df) { (acc, r) =>
      val cast = r.castTo.map(t => col(r.from).cast(t)).getOrElse(col(r.from))
      acc.withColumn(r.to, cast)
        .drop(Seq(r.from).filterNot(_ == r.to): _*)
    }
    conform(renamed, target)
  }

  /** Project a frame onto `target`: keep matching columns (cast where the
    * type differs), backfill absent nullable columns with typed nulls.
    */
  def conform(df: DataFrame, target: StructType = v3): DataFrame = {
    val present = df.columns.toSet
    val cols: Seq[Column] = target.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  /** Batch-level drift report over a mixed-version frame: per version,
    * row count and the columns that version lacks vs the full schema —
    * the run-report line the agent keys its remap decision on.
    */
  def driftReport(parsed: DataFrame): DataFrame =
    parsed.groupBy("version").agg(count(lit(1)).as("n"))
      .withColumn("missing_vs_v3",
        when(col("version") === 1, lit("marketing_opt_in,customer_segment"))
          .when(col("version") === 2, lit("customer_segment"))
          .otherwise(lit("")))
      .orderBy("version")

  /** Data-driven drift detection over RAW JSON payloads — the column-set
    * diff the reference wrote but made dead code by running it after
    * `from_json` against a fixed schema (ingest_transform.py:141-154):
    * post-parse, the frame always has exactly the declared columns, so
    * the diff can never fire. Real detection reads the payloads' actual
    * top-level key sets (`json_object_keys`, before any schema is
    * imposed) and reports, per key observed-or-expected:
    *
    *   - `new`      — key on the wire but not in the expected schema
    *                  (the v2/v3 drift signal);
    *   - `missing`  — expected but never present in the batch;
    *   - `partial`  — expected, present in some rows (nullable-field
    *                  anomalies);
    *   - `complete` — expected, present in every row.
    *
    * ONE scan, one shuffle: every row emits a sentinel key alongside its
    * observed keys, so the per-key presence counts AND the doc total come
    * out of the same map-side-combined aggregate — the JSON parse (the
    * dominant cost) runs exactly once over the corpus, and the doc-total
    * attach is a window over the O(distinct keys) aggregate rather than a
    * second corpus scan + cross join. No per-row driver work; the report
    * is O(distinct keys).
    */
  def schemaDriftReport(raw: DataFrame, jsonCol: Column,
      expected: Seq[String]): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    // NUL cannot begin a sane JSON object key; the sentinel counts docs
    val Sentinel = "\u0000__n_docs__"
    val counts = raw.select(explode(concat(
        array(lit(Sentinel)), json_object_keys(jsonCol))).as("column_name"))
      .groupBy("column_name").agg(count(lit(1)).as("n_present"))
    val exp = expected.toDF("column_name")
      .withColumn("is_expected", lit(true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy() // single partition over the O(keys) aggregate only
    counts.join(exp, Seq("column_name"), "full_outer")
      .withColumn("n_docs", coalesce(max(when(
        col("column_name") === Sentinel, col("n_present"))).over(w), lit(0L)))
      .filter(col("column_name") =!= Sentinel)
      .select(col("column_name"),
        coalesce(col("n_present"), lit(0L)).as("n_present"),
        col("n_docs"),
        when(!coalesce(col("is_expected"), lit(false)), "new")
          .when(coalesce(col("n_present"), lit(0L)) === 0, "missing")
          .when(col("n_present") < col("n_docs"), "partial")
          .otherwise("complete").as("status"))
      .orderBy("column_name")
  }
}
