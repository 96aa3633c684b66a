package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.SchemaEvolution
import graft.schema.SchemaEvolution._

/** Drift classification + remap application (SURVEY.md §1.2, O4/P8). */
class SchemaEvolutionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("version ladder: v1 ⊂ v2 ⊂ v3 additively") {
    assert(v1.fieldNames.length == 8)
    assert(v2.fieldNames.length == 9)
    assert(v3.fieldNames.length == 10)
    assert(v2.fieldNames.toSet -- v1.fieldNames.toSet
      == Set("marketing_opt_in"))
    assert(v3.fieldNames.toSet -- v2.fieldNames.toSet
      == Set("customer_segment"))
    assert(schemaFor(1) == v1 && schemaFor(2) == v2 && schemaFor(7) == v3)
  }

  test("classify: additive nullable columns auto-remap") {
    val observed = StructType(v3.fields :+
      StructField("loyalty_tier", StringType, nullable = true))
    assert(classify(observed) == AdditiveDrift(Seq("loyalty_tier")))
    assert(classify(v3) == NoDrift)
    assert(classify(v1) == NoDrift) // missing optional fields: not drift
  }

  test("classify: missing required field or type change is breaking") {
    val noEmail = StructType(v3.fields.filterNot(_.name == "email"))
    classify(noEmail) match {
      case BreakingDrift(missing, _) => assert(missing == Seq("email"))
      case other => fail(s"expected breaking, got $other")
    }
    val retyped = StructType(v3.fields.map(f =>
      if (f.name == "signup_ts") f.copy(dataType = StringType) else f))
    classify(retyped) match {
      case BreakingDrift(_, changed) =>
        assert(changed == Seq(("signup_ts", LongType, StringType)))
      case other => fail(s"expected breaking, got $other")
    }
  }

  test("applyRemap renames, casts and conforms to the target schema") {
    import spark.implicits._
    val drifted = Seq(("c1", "a@b.com", "1700000000000"))
      .toDF("customer_id", "email", "signup_epoch")
    val remapped = SchemaEvolution.applyRemap(drifted, Seq(
      Remap("customer_id", "id", None),
      Remap("signup_epoch", "signup_ts", Some(LongType))))
    assert(remapped.schema == v3)
    val r = remapped.head()
    assert(r.getAs[String]("id") == "c1")
    assert(r.getAs[Long]("signup_ts") == 1700000000000L)
    assert(r.isNullAt(remapped.schema.fieldIndex("customer_segment")))
  }

  test("conform backfills v1 frames to v3 with typed nulls") {
    import spark.implicits._
    val v1Frame = Seq(("c1", "n", "a@b.com", 1L, "US", "free", 2L, 1))
      .toDF("id", "name", "email", "signup_ts", "country", "plan",
        "event_ts", "version")
    val out = conform(v1Frame)
    // tuple-derived frames carry non-nullable primitives; compare shape
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == v3.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(out.head().isNullAt(out.schema.fieldIndex("marketing_opt_in")))
  }

  test("drift report counts rows per wire version") {
    val parsed = CustomerEvents.synth(Tables(spark, Sf0001).events)
    val rep = driftReport(parsed).collect()
    assert(rep.map(_.getAs[Long]("version")).toSeq == Seq(1L, 2L, 3L))
    assert(rep.map(_.getAs[Long]("n")).sum == parsed.count())
    assert(rep.find(_.getAs[Long]("version") == 2L).get
      .getAs[String]("missing_vs_v3") == "customer_segment")
  }

  test("data-driven drift detection surfaces planted v2/v3 keys from raw JSON") {
    import spark.implicits._
    // raw wire payloads, no schema imposed: v1, v2 (+marketing_opt_in),
    // v3 (+customer_segment), one with a missing nullable base field,
    // and one with a key outside every declared version
    val raw = Seq(
      """{"id":"a","name":"n","email":"a@x.io","signup_ts":1,"country":"US","plan":"free","event_ts":2,"version":1}""",
      """{"id":"b","name":"n","email":"b@x.io","signup_ts":1,"country":"US","plan":"free","event_ts":2,"version":2,"marketing_opt_in":true}""",
      """{"id":"c","name":"n","email":"c@x.io","signup_ts":1,"country":"US","plan":"free","event_ts":2,"version":3,"marketing_opt_in":false,"customer_segment":"standard"}""",
      """{"id":"d","email":"d@x.io","signup_ts":1,"country":"US","plan":"free","event_ts":2,"version":1}""",
      """{"id":"e","name":"n","email":"e@x.io","signup_ts":1,"country":"US","plan":"free","event_ts":2,"version":1,"rogue_field":7}""")
      .toDF("payload")
    val rep = SchemaEvolution
      .schemaDriftReport(raw, col("payload"), v1.fieldNames.toSeq)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(rep("marketing_opt_in") == ((2L, "new")))
    assert(rep("customer_segment") == ((1L, "new")))
    assert(rep("rogue_field") == ((1L, "new")))
    assert(rep("name") == ((4L, "partial")))
    assert(rep("id") == ((5L, "complete")))
    assert(rep("version") == ((5L, "complete")))
    assert(rep.size == v1.fieldNames.length + 3)
  }
}
