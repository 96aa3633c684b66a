package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.report.Analytics

/** Join/window/set-op semantics plus physical-plan shape assertions: the
  * 100 TB posture claims in Analytics' Scaladoc (broadcast dims, pushed
  * filters, single-scan set ops) are pinned here against the actual
  * Catalyst output, not just prose.
  */
class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val t = Tables(spark, Sf0001)

  test("set-ops query equals Dataset intersect/except semantics") {
    val events = t.events
    val purchasers = events.filter(col("event_type") === "purchase")
      .select("user_id").distinct()
    val errored = events.filter(col("event_type") === "error")
      .select("user_id").distinct()
    val r = Analytics.purchaseErrorSetOps(events).head()
    assert(r.getAs[Long]("n_purchasers") == purchasers.count())
    assert(r.getAs[Long]("n_errored") == errored.count())
    assert(r.getAs[Long]("n_both") == purchasers.intersect(errored).count())
    assert(r.getAs[Long]("n_purchase_only")
      == purchasers.except(errored).count())
  }

  test("revenue_by_region plan broadcasts the small dims") {
    val plan = Analytics.revenueByRegion(t).queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q1 filter is pushed down to the parquet scan") {
    val df = t.lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      scan.take(2000))
  }

  test("scan prunes columns to the projection") {
    val df = t.lineitem.groupBy("l_returnflag")
      .agg(sum("l_quantity").as("q"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_returnflag:string,l_quantity:double>")
      || scan.contains("ReadSchema: struct<l_quantity:double,l_returnflag:string>"),
      scan.take(2000))
  }

  test("aggregations run partial then final (map-side combine)") {
    val plan = Analytics.hourlyEventCounts(t.events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2) // partial + final
  }

  test("session_window merges events within the gap") {
    import spark.implicits._
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-01 00:10:00", 2.0),  // +10m: same session
      (1L, "2024-01-01 01:00:00", 3.0),  // +50m: new session
      (2L, "2024-01-01 00:00:00", 4.0))
      .toDF("user_id", "s", "value")
      .withColumn("ts", to_timestamp(col("s")))
    val r = Analytics.sessionWindows(events).orderBy("user_id",
      "session_start_us").collect()
    assert(r.length == 3)
    assert(r(0).getAs[Long]("n_events") == 2)
    // session end = last event + 30min gap
    val endUs = r(0).getAs[Long]("session_end_us")
    val startUs = r(0).getAs[Long]("session_start_us")
    assert(endUs - startUs == (10 * 60 + 30 * 60) * 1000000L)
  }

  test("session_texts builds ordered sequences split at the gap") {
    import spark.implicits._
    // rows deliberately out of order; two sessions for user 1 split at
    // the 30-min gap; equal-ts tiebreak falls to event_id
    val events = Seq(
      (3L, 1L, "2024-01-01 00:10:00", "click"),
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:00:00", "view2"),   // same ts as id 1
      (4L, 1L, "2024-01-01 01:00:00", "purchase"), // +50m: new session
      (5L, 2L, "2024-01-01 00:00:00", "view"))
      .toDF("event_id", "user_id", "s", "event_type")
      .withColumn("ts", to_timestamp(col("s")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val r = Analytics.sessionTexts(events).collect()
    assert(r.length == 3)
    val u1 = r.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1(0).getAs[String]("seq") == "view view2 click")
    assert(u1(0).getAs[Long]("duration_s") == 600L)
    assert(u1(1).getAs[String]("seq") == "purchase"
      && u1(1).getAs[Long]("n_events") == 1L)
  }

  test("dialog pairs: prefix contexts within sessions only") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "2024-01-01 00:00:00", "view"),
      (2L, 1L, "2024-01-01 00:05:00", "click"),
      (3L, 1L, "2024-01-01 00:10:00", "purchase"),
      (4L, 1L, "2024-01-01 01:00:00", "view"),   // new session: no pair
      (5L, 2L, "2024-01-01 00:00:00", "view"))   // 1-event session
      .toDF("event_id", "user_id", "s", "event_type")
      .withColumn("ts", to_timestamp(col("s")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val r = Analytics.dialogPairs(events).collect()
    assert(r.length == 2)  // only user 1 session 1 positions 2 and 3
    assert(r(0).getAs[String]("context") == "view"
      && r(0).getAs[String]("response") == "click")
    assert(r(1).getAs[String]("context") == "view click"
      && r(1).getAs[String]("response") == "purchase")
  }

  test("decayed engagement halves per day with exact integers") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, "2024-01-10 12:00:00", "view"),  // as-of day
      (2L, 1L, "2024-01-09 12:00:00", "view"),  // 1 day back
      (3L, 1L, "2024-01-07 12:00:00", "view"),  // 3 days back
      (4L, 2L, "2023-12-01 00:00:00", "click")) // 40 days: underflow
      .toDF("event_id", "user_id", "s", "event_type")
      .withColumn("ts", to_timestamp(col("s")))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val r = Analytics.decayedEngagement(events).collect()
      .map(x => (x.getAs[Long]("user_id"),
        x.getAs[String]("event_type")) -> x).toMap
    // 1e6 + 5e5 + 125e3 exactly
    assert(r((1L, "view")).getAs[Long]("decayed_micros") == 1625000L)
    assert(r((1L, "view")).getAs[Long]("days_since_last") == 0L)
    assert(r((2L, "click")).getAs[Long]("decayed_micros") == 0L)
    assert(r((2L, "click")).getAs[Long]("days_since_last") == 40L)
  }

  test("key skew report flags only the hot key") {
    import spark.implicits._
    // 99 uniform keys × 10 rows + one hot key: at 100 rows the hot key
    // is 9.2× the mean (under the 10× bar — no flag); at 4000 rows it
    // is 80× (flag). Only the hot key may ever flag.
    val mk = (hot: Int) => ((1 to 99).flatMap(k =>
      Seq.fill(10)(k.toLong)) ++ Seq.fill(hot)(999L))
      .toDF("user_id")
    val calm = graft.ops.Diagnostics.keySkewReport(mk(100), "user_id")
      .collect()
    val hot = calm.find(_.getAs[Long]("key") == 999L).get
    assert(hot.getAs[Long]("n") == 100L
      && hot.getAs[Long]("share_ppm") == 100L * 1000000L / 1090L)
    assert(calm.forall(!_.getAs[Boolean]("salt_recommended")))
    val spiky = graft.ops.Diagnostics.keySkewReport(mk(4000), "user_id")
      .collect()
    assert(spiky.find(_.getAs[Long]("key") == 999L).get
      .getAs[Boolean]("salt_recommended"))
    assert(spiky.count(_.getAs[Boolean]("salt_recommended")) == 1)
  }

  test("sliding windows place every event in exactly two windows") {
    val total = t.events.count()
    val windowed = Analytics.slidingWindowCounts(t.events)
      .agg(sum("n")).head().getLong(0)
    assert(windowed == 2 * total)
  }

  test("semi/anti flows partition orders exactly") {
    val flows = Analytics.ordersByLateShipment(t)
      .groupBy("flow").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(flows("with_late") + flows("without_late") == t.orders.count())
  }

  test("customer_value_ranks: two-phase top-k equals the global window") {
    import org.apache.spark.sql.expressions.Window
    val got = Analytics.customerValueRanks(t).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    // the naive formulation the scale-safe one replaced
    val rev = t.orders.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
    val w = Window.orderBy(col("revenue").desc, col("o_custkey"))
    val want = rev.select(col("o_custkey"), col("revenue"),
        dense_rank().over(w).cast("long").as("rk"),
        round(percent_rank().over(w), 6).as("pr"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("revenue").desc, col("o_custkey")).limit(50)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.sameElements(want))
    // plan: distributed top-k merge, not a full-data global sort; the
    // only window input is the k-row limited side
    val plan = Analytics.customerValueRanks(t)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("hourly gap-fill: missing hours appear zero-filled, bounds exact") {
    import spark.implicits._
    // hours 0, 1, 4 populated; 2 and 3 are gaps
    val ev = Seq(
      (0L, "a"), (1800000L, "b"), (3600000L, "c"), (14400000L, "d"))
      .toDF("ms", "event_type")
      .select(timestamp_millis(col("ms")).as("ts"), col("event_type"))
    val got = Analytics.hourlyGapfill(ev).orderBy("hour_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 2L), (1L, 1L), (2L, 0L), (3L, 0L),
      (4L, 1L)))
    // empty input -> empty output, not a crash on null bounds
    assert(Analytics.hourlyGapfill(ev.filter(lit(false))).count() == 0)
  }

  test("event_funnel only credits stages reached in order") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "purchase"),
      // user 2: purchase BEFORE first view — view stage only
      (2L, 0L, "purchase"), (2L, 10L, "view"),
      // user 3: click before first view — click must not count
      (3L, 5L, "click"), (3L, 10L, "view"),
      // user 4: click ok, purchase precedes the qualifying click
      (4L, 0L, "view"), (4L, 5L, "purchase"), (4L, 10L, "click"))
      .toDF("user_id", "ms", "event_type")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("event_type"))
    val r = Analytics.eventFunnel(ev).orderBy("stage").collect()
      .map(x => (x.getAs[String]("stage_name"), x.getAs[Long]("users"),
        x.getAs[Long]("conv_ppm"), x.getAs[Long]("funnel_ppm")))
    assert(r.toSeq == Seq(
      ("view", 4L, 1000000L, 1000000L),
      ("click", 2L, 500000L, 500000L),
      ("purchase", 1L, 500000L, 250000L)))
  }

  test("cohort_retention keys on signup week and skips non-signups") {
    import spark.implicits._
    val wkMs = 604800000L
    val ev = Seq(
      // users 1 and 2 sign up in week 0; only user 1 returns in week 1
      (1L, 0L, "signup"), (2L, 1000L, "signup"),
      (1L, wkMs + 5L, "view"),
      // user 3 never signs up — must not appear in any cohort
      (3L, 10L, "view"), (3L, wkMs + 10L, "view"))
      .toDF("user_id", "ms", "event_type")
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts"),
        col("event_type"))
    val r = Analytics.cohortRetention(ev)
      .orderBy("cohort_wk", "week_offset").collect()
      .map(x => (x.getAs[Long]("cohort_wk"), x.getAs[Long]("week_offset"),
        x.getAs[Long]("active_users")))
    assert(r.toSeq == Seq((0L, 0L, 2L), (0L, 1L, 1L)))
  }

  test("hourly_anomalies flags a spike against the trailing window") {
    import spark.implicits._
    // hours 0..7 alternate 1/2 events; hour 8 spikes to 40
    val rows = (0 to 7).flatMap { h =>
      (0 until (if (h % 2 == 0) 1 else 2)).map(i => h * 3600000L + i)
    } ++ (0 until 40).map(i => 8 * 3600000L + i)
    val ev = rows.toDF("ms")
      .select(timestamp_millis(col("ms")).as("ts"),
        lit("e").as("event_type"), lit(1L).as("user_id"))
    val r = Analytics.hourlyAnomalies(ev, lookback = 4, zThresh = 3.0)
      .orderBy("hour_id").collect()
    // scoring starts once the window is full (hour 4) and every scored
    // hour keeps a row; only the spike is flagged
    assert(r.map(_.getAs[Long]("hour_id")).toSeq == Seq(4L, 5L, 6L, 7L, 8L))
    val flagged = r.filter(_.getAs[Long]("is_anomaly") == 1L)
      .map(_.getAs[Long]("hour_id"))
    assert(flagged.toSeq == Seq(8L))
    val spike = r.last
    assert(spike.getAs[Double]("mean_n") == 1.5)
    assert(spike.getAs[Double]("z") > 10.0)
  }
}
