package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Specs for the union-tag backward as-of join: match selection, `>=`
  * tie semantics, no-match nulls, tolerance cutoff, key isolation, and
  * equivalence with the brute-force formulation on random data.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val quotes = Seq(
    // (key, ts, px)
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0)).toDF("k", "qts", "px")

  private lazy val trades = Seq(
    // (key, ts, qty)
    ("a", 9L, 100L),  // before any quote -> null
    ("a", 20L, 200L), // tie: >= picks the ts=20 quote
    ("a", 25L, 300L), // between -> ts=20 quote
    ("a", 99L, 400L), // far after -> ts=30 quote
    ("b", 16L, 500L), // key isolation -> b's own quote
    ("c", 50L, 600L)) // key with no quotes -> null
    .toDF("k", "tts", "qty")

  test("backward as-of picks greatest right ts <= left ts, per key") {
    val r = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("qts", "px"))
      .orderBy("k", "tts").collect()
      .map(x => (x.getString(0), x.getLong(1),
        Option(x.get(x.fieldIndex("asof_px")))))
    assert(r.toSeq == Seq(
      ("a", 9L, None), ("a", 20L, Some(2.0)), ("a", 25L, Some(2.0)),
      ("a", 99L, Some(3.0)), ("b", 16L, Some(9.0)), ("c", 50L, None)))
  }

  test("tolerance nulls out matches older than the lookback") {
    val r = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), tolerance = Some(lit(10L)))
      .orderBy("k", "tts").collect()
      .map(x => Option(x.get(x.fieldIndex("asof_px"))))
    // a@99 matched quote@30: gap 69 > 10 -> null; a@25 gap 5 -> kept
    assert(r.toSeq == Seq(
      None, Some(2.0), Some(2.0), None, Some(9.0), None))
  }

  test("left columns pass through unchanged; payload is prefixed") {
    val r = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts",
      Seq("px"))
    assert(r.columns.toSeq == Seq("k", "tts", "qty", "asof_px"))
    assert(r.count() == trades.count()) // left join: all probe rows kept
  }

  test("equivalent to the brute-force max-per-probe formulation") {
    // two regimes: spread timestamps (mod 10000: few ties) and heavily
    // tied ones (mod 40: many right rows share (k, ts) — the regime the
    // deterministic third sort key exists for). The matched TS must
    // equal brute force in both; the payload pick among equal-ts rows is
    // arbitrary-but-deterministic, so only rts is compared.
    for (m <- Seq(10000L, 40L)) {
      val l = spark.range(500).select(
        pmod(col("id"), lit(7)).as("k"),
        pmod(xxhash64(col("id")), lit(m)).as("lts"),
        col("id").as("lid"))
      val rt = spark.range(300).select(
        pmod(col("id") * 31, lit(7)).as("k"),
        pmod(xxhash64(col("id"), lit(1)), lit(m)).as("rts"),
        col("id").as("rid"))
      val fast = AsOfJoin.backward(l, rt, Seq("k"), "lts", "rts", Seq("rts"))
        .select(col("lid"), col("asof_rts"))
      // brute force: inequality join + max(rts) per probe (the
      // formulation that degenerates at scale — semantic oracle only)
      val brute = l.join(rt, l("k") === rt("k") && col("lts") >= col("rts"),
          "left")
        .groupBy(col("lid")).agg(max(col("rts")).as("asof_rts"))
      val diff = fast.exceptAll(brute).count() +
        brute.exceptAll(fast).count()
      assert(diff == 0L, s"mod=$m")
    }
  }

  test("tied right rows: payload pick is deterministic across layouts") {
    import spark.implicits._
    val l = Seq(("a", 10L, 1L)).toDF("k", "lts", "lid")
    val rt = (1L to 40L).map(i => ("a", 10L, i)).toDF("k", "rts", "rid")
    def pick(parts: Int) = AsOfJoin
      .backward(l, rt.repartition(parts), Seq("k"), "lts", "rts",
        Seq("rid"))
      .head.getAs[Long]("asof_rid")
    val p1 = pick(1)
    assert(Seq(2, 7, 13, 32).map(pick).forall(_ == p1))
  }

  test("forward as-of picks smallest right ts >= left ts") {
    val r = AsOfJoin.forward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("qts", "px"))
      .orderBy("k", "tts").collect()
      .map(x => (x.getString(0), x.getLong(1),
        Option(x.get(x.fieldIndex("asof_px")))))
    assert(r.toSeq == Seq(
      ("a", 9L, Some(1.0)),  // next quote at 10
      ("a", 20L, Some(2.0)), // tie: <= matches the ts=20 quote
      ("a", 25L, Some(3.0)), // next at 30
      ("a", 99L, None),      // nothing after
      ("b", 16L, None), ("c", 50L, None)))
  }

  test("forward tolerance bounds the wait ahead") {
    val r = AsOfJoin.forward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("px"), tolerance = Some(lit(3L)))
      .orderBy("k", "tts").collect()
      .map(x => Option(x.get(x.fieldIndex("asof_px"))))
    // a@25 matched quote@30: wait 5 > 3 -> null; a@9 wait 1 -> kept
    assert(r.toSeq == Seq(
      Some(1.0), Some(2.0), None, None, None, None))
  }

  test("attribution query: every touch precedes its purchase") {
    val r = graft.report.Analytics.purchaseAttribution(
      Tables(spark, "/root/testdata/sf0.001").events)
    assert(r.filter(col("gap_ms") < 0).count() == 0)
    assert(r.count() > 0)
    assert(r.filter(col("touch_id").isNotNull).count() > 0)
    // spot-check one user end-to-end: recompute their attribution by hand
    val u = r.filter(col("touch_id").isNotNull).head.getAs[Long]("user_id")
    val ev = Tables(spark, "/root/testdata/sf0.001").events
      .filter(col("user_id") === u)
      .select(col("event_id"), col("event_type"), unix_millis(col("ts")))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val expected = ev.filter(_._2 == "purchase").map { case (pid, _, pts) =>
      val touch = ev.filter(e =>
        (e._2 == "click" || e._2 == "view") && e._3 <= pts)
        .sortBy(e => (e._3, e._1)).lastOption
      pid -> touch.map(_._1)
    }.toMap
    val got = r.filter(col("user_id") === u)
      .select("purchase_id", "touch_id").collect()
      .map(x => x.getLong(0) ->
        Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == expected)
  }
}
