package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyLink

/** Deletion-neighborhood fuzzy linkage: the blocking guarantee (every
  * distance-≤1 pair shares a deletion variant), the distance bound, and
  * the hub-variant cap.
  */
class FuzzyLinkSpec extends AnyFunSuite {
  import SparkTestSession._

  private def keys(rows: Seq[String]) = {
    import spark.implicits._
    rows.toDF("key")
  }

  test("every edit type within distance 1 is found; distance 2 is not") {
    val clean = keys(Seq("alpha", "borealis", "gamma"))
    val dirty = keys(Seq(
      "alpha",     // identical -> excluded
      "alpxa",     // substitution (mid)
      "xlpha",     // substitution (first char)
      "alphax",    // insertion (tail)
      "aborealis", // insertion (head)
      "boreals",   // deletion
      "gxmmx"))    // distance 2 from gamma -> must NOT link
    val got = FuzzyLink.linkage(clean, dirty).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("alpha", "alpxa", 1L), ("alpha", "xlpha", 1L),
      ("alpha", "alphax", 1L),
      ("borealis", "aborealis", 1L), ("borealis", "boreals", 1L)))
  }

  test("hub variants above the df cap block nothing") {
    // 26 strings "aa".."az": every cross pair is distance 1 but shares
    // ONLY the degenerate variant "a" — a cap below 26 drops them all
    val s = ('a' to 'z').map(c => s"a$c")
    val all = FuzzyLink.linkage(keys(s), keys(s)).count()
    assert(all == 26L * 25) // default cap admits every ordered pair
    val capped = FuzzyLink.linkage(keys(s), keys(s), maxBlockDf = 5).count()
    assert(capped == 0L)
  }

  test("linkage deduplicates records before blocking") {
    val clean = keys(Seq("alpha", "alpha", "alpha"))
    val dirty = keys(Seq("alpxa", "alpxa"))
    assert(FuzzyLink.linkage(clean, dirty).count() == 1L)
  }
}
