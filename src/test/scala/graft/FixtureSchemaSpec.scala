package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-schema canary: pins the loaded Spark types of all 10 driver
  * tables to what the engine (and the DuckDB oracle dialect) assumes.
  *
  * The round-7 fixture regeneration silently changed `events.ts` from
  * TIMESTAMP(NANOS) to plain TIMESTAMP(MICROS) and 36 queries crashed with
  * cryptic DATATYPE_MISMATCH errors. This spec exists so the next silent
  * regeneration fails with one named assertion instead.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fields(df: org.apache.spark.sql.DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType)

  // Fixture timestamps may ship with or without the UTC flag (LTZ vs NTZ) —
  // both are fine because every entrypoint pins the session to UTC; what
  // matters is that they are timestamps at all, not strings/longs.
  private def isTimestamp(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private lazy val t = Tables(spark, Sf0001)

  test("TPC-H-ish tables load with the pinned key/measure types") {
    assert(fields(t.region) == Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields(t.nation) == Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(fields(t.customer) == Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(fields(t.supplier) == Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields(t.part) == Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    val orders = fields(t.orders)
    assert(orders.map(_._1) == Seq("o_orderkey", "o_custkey",
      "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(orders.toMap.apply("o_orderkey") == LongType)
    assert(isTimestamp(orders.toMap.apply("o_orderdate")),
      s"o_orderdate must be a timestamp, got ${orders.toMap.apply("o_orderdate")}")
    val li = fields(t.lineitem).toMap
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType
      && li("l_extendedprice") == DoubleType && li("l_returnflag") == StringType)
    assert(isTimestamp(li("l_shipdate")),
      s"l_shipdate must be a timestamp, got ${li("l_shipdate")}")
  }

  test("events loads through Tables with ts as session-TZ TimestampType") {
    // Tables.events normalizes every shipped fixture format (NTZ micros,
    // legacy nanos-as-long) to TimestampType; the whole event surface
    // (enrich/DQ/incidents/sessions) depends on exactly this contract.
    val ev = fields(t.events)
    assert(ev == Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType))
  }

  test("documents and embeddings load with the pinned shapes") {
    assert(fields(t.documents) == Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(fields(t.embeddings) == Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> LongType)) // INT32 on disk, canonicalized at load
  }

  test("events ts values are sane instants under the UTC session") {
    // A unit mix-up (nanos read as micros, or seconds as millis) lands
    // outside any plausible fixture year; pin the decade.
    val row = t.events.selectExpr(
      "min(year(ts)) AS lo", "max(year(ts)) AS hi").head()
    val (lo, hi) = (row.getInt(0), row.getInt(1))
    assert(lo >= 2000 && hi <= 2100, s"events.ts years [$lo,$hi] out of range")
  }
}
