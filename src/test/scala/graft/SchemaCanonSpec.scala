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
  *  - ARRAY of any of the above
  */
class SchemaCanonSpec extends AnyFunSuite {
  import SparkTestSession._

  private def canonical(dt: DataType): Boolean = dt match {
    case LongType | DoubleType | StringType | BooleanType |
        TimestampType | DateType | BinaryType => true
    case ArrayType(e, _) => canonical(e)
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
         |DECIMAL→cast double/long, FLOAT→cast double):
         |  ${offenders.mkString("\n  ")}""".stripMargin)
  }
}
