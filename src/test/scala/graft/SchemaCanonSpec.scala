package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-type canonicalization audit over EVERY SparkEntry query.
  *
  * The driver's correctness gate hashes values WITH their physical
  * column types, so a Spark INTEGER vs a DuckDB BIGINT (or a DuckDB
  * HUGEINT window sum vs a Spark BIGINT) hash-mismatches even when
  * every cell is value-identical — the exact failure class that cost
  * rounds 8 and 9 a combined five red rows. This spec makes the
  * discipline structural: every query output column must use one of
  * the canonical cross-engine types below, so an INT ordinal from
  * `posexplode` or a DECIMAL from an unchecked aggregate can never
  * reach the verify surface again. The DuckDB side of the same audit
  * lives in tools/check_oracle.py (physical DESCRIBE compare).
  *
  *  - BIGINT   (LongType)    — every integer, including ordinals
  *  - DOUBLE   (DoubleType)  — every fraction/score
  *  - STRING, BOOLEAN, TIMESTAMP, DATE
  *  - BINARY   (BinaryType)  — opaque multimodal payloads
  *
  * Top-level ARRAY columns are REJECTED on the verified surface (the
  * round-10 red class): the driver re-sorts both sides' rows in
  * pandas before hashing, and pandas `sort_values` cannot hash numpy
  * arrays — any array column crashes the comparator as `err`
  * regardless of value correctness. Arrays stay legal in the
  * non-verified library APIs (e.g. [[graft.ext.EmbedStats
  * .hashEmbeddings]]); a verified query must long-form them
  * (posexplode) or string-join them (`array_join`), the shapes
  * `embedding_project` and `dedup_manifest` use.
  */
class SchemaCanonSpec extends AnyFunSuite {
  import SparkTestSession._

  private def canonical(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | StringType | BooleanType |
        TimestampType | DateType | BinaryType => true
    case _ => false
  }

  test("every query output column is a canonical cross-engine type") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, Sf0001).schema.fields.collect {
          case f if !canonical(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.sql}"
        }
    }
    assert(offenders.isEmpty,
      s"""non-canonical physical types in query outputs (INT→cast long,
         |DECIMAL→cast double/long, FLOAT→cast double, ARRAY→posexplode
         |long-form or array_join — the driver's pandas row-sort cannot
         |hash arrays):
         |  ${offenders.mkString("\n  ")}""".stripMargin)
  }
}
