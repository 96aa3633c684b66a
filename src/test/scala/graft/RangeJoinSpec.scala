package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Specs for the bucketized point-in-interval join: boundary
  * inclusivity, no-dedup-needed property, bucket-width independence,
  * keyed grouping, and equivalence with the brute-force theta join.
  */
class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val intervals = Seq(
    // (iv_id, s, e)
    (1L, 10L, 20L), (2L, 15L, 25L), (3L, 100L, 100L))
    .toDF("iv_id", "s", "e")
  private lazy val points = Seq(
    // (p_id, v)
    (1L, 9L), (2L, 10L), (3L, 20L), (4L, 22L), (5L, 100L), (6L, 101L))
    .toDF("p_id", "v")

  private def pairs(bucketWidth: Long) =
    RangeJoin.pointInInterval(points, intervals, "v", "s", "e",
        bucketWidth = bucketWidth)
      .select("p_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("both interval bounds are inclusive; overlaps multiply") {
    assert(pairs(7L).sorted == Seq(
      (2L, 1L),           // v=10 == s of [10,20]
      (3L, 1L), (3L, 2L), // v=20: end of iv1, inside iv2
      (4L, 2L),
      (5L, 3L)))          // degenerate [100,100] catches exactly 100
  }

  test("result is bucket-width independent (incl. width > all values)") {
    val expected = pairs(7L).sorted
    for (w <- Seq(1L, 3L, 10L, 1000L))
      assert(pairs(w).sorted == expected, s"width=$w")
  }

  test("each matching pair appears exactly once (no bucket dedup pass)") {
    // width 1: interval [10,20] explodes onto 11 buckets; the contained
    // point must still match once, not once per bucket
    val p = pairs(1L)
    assert(p.distinct.length == p.length)
  }

  test("keys scope the join") {
    val iv = Seq(("a", 1L, 0L, 100L), ("b", 2L, 0L, 100L))
      .toDF("k", "iv_id", "s", "e")
    val pt = Seq(("a", 1L, 50L), ("c", 2L, 50L)).toDF("k", "p_id", "v")
    val r = RangeJoin.pointInInterval(pt, iv, "v", "s", "e",
        keys = Seq("k"), bucketWidth = 10L)
      .select("p_id", "iv_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((1L, 1L))) // same-key containment only
  }

  test("equivalent to the brute-force theta join on random data") {
    val pt = spark.range(2000).select(col("id").as("p_id"),
      pmod(xxhash64(col("id")), lit(5000)).as("v"))
    val iv = spark.range(500).select(col("id").as("iv_id"),
      pmod(xxhash64(col("id"), lit(7)), lit(5000)).as("s"))
      .withColumn("e", col("s") + pmod(xxhash64(col("iv_id")), lit(200)))
    val fast = RangeJoin.pointInInterval(pt, iv, "v", "s", "e",
      bucketWidth = 128L).select("p_id", "iv_id")
    val brute = pt.join(iv, col("v") >= col("s") && col("v") <= col("e"))
      .select("p_id", "iv_id")
    assert(fast.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(fast).count() == 0)
    assert(brute.count() > 0)
  }

  test("errors_near_purchases matches a windowless recount on sf0.001") {
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    val r = graft.report.Analytics.errorsNearPurchases(ev)
    assert(r.count() > 0)
    // recompute one purchase by hand
    val row = r.orderBy("purchase_id").head
    val (pid, n) = (row.getLong(0), row.getAs[Long]("n_errors"))
    val pMs = ev.filter(col("event_id") === pid)
      .select(unix_millis(col("ts"))).head.getLong(0)
    val expected = ev.filter(col("event_type") === "error")
      .filter(unix_millis(col("ts")).between(pMs - 600000L, pMs)).count()
    assert(n == expected)
  }
}
