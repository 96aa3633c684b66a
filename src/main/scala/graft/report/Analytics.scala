package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational analytics over the TPC-H-ish fixtures — the join / window /
  * set-op surface (SURVEY.md §2.5, §2.6) the reference only implies
  * (country→region lookup, last-N incidents, quarantine exclusion),
  * expressed at the scale-idiomatic end: broadcast the bounded dims, let
  * the fact-side equi-joins shuffle on their keys, keep aggregates
  * partial+final.
  *
  * 100 TB posture notes per operator are in the Scaladoc of each def.
  */
object Analytics {

  /** orders ⋈ customer ⋈ nation ⋈ region revenue rollup.
    * customer/orders shuffle on custkey; nation (25) and region (5) are
    * broadcast — no shuffle for the dim lookups at any scale.
    */
  def revenueByRegion(t: Tables): DataFrame =
    t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_revenue"))

  /** TPC-H Q3 pattern: filtered 3-way join, grouped revenue, top-10.
    * Filters sit directly on the scans (pushed to parquet); the top-10 is
    * a global sort of the *aggregated* (small) side only.
    */
  def shippingPriority(t: Tables): DataFrame = {
    val c = t.customer.filter(col("c_mktsegment") === "BUILDING")
    val o = t.orders.filter(col("o_orderdate") < lit("1998-06-30").cast("timestamp"))
    val l = t.lineitem.filter(col("l_shipdate") > lit("1998-06-30").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("l_orderkey"),
        // o_orderdate is TIMESTAMP_NTZ in the fixture parquet; cast to LTZ
        // (session tz is UTC) for unix_millis
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 pattern: 6-way join with local-supplier condition
    * (c_nationkey = s_nationkey), revenue by nation within a region.
    */
  def localSupplierVolume(t: Tables, regionName: String = "ASIA"): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === regionName)
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))

  /** Ranking window: top-3 orders per customer by value.
    * Shuffles once on o_custkey; rank + filter happen within partitions.
    */
  def topOrdersPerCustomer(t: Tables, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    t.orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Sessionization: 30-min-gap sessions per user (SURVEY.md §2.6
    * extension). One shuffle on user_id; lag + running-sum windows share
    * that partitioning, so the whole thing is a single exchange.
    */
  def sessionsPerUser(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
             > gapMinutes * 60L, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum("new_session").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  /** Log-to-corpus: each 30-min-gap session becomes one ordered
    * event-type sequence string — the standard construction of
    * behavioral training corpora (session2vec / next-event LMs) from
    * raw event logs.
    *
    * Same single user_id exchange as [[sessionsPerUser]] (lag +
    * running-sum windows and the final group share the partitioning).
    * `collect_list` order is not deterministic in Spark, so the
    * sequence sorts a (ts, event_id, event_type) struct array before
    * joining — bit-stable across retries/partitionings, and exactly
    * DuckDB's `string_agg(... ORDER BY ts, event_id)`. Per-session
    * state is session-length-bounded; a hyperactive key at 100 TB gets
    * the same secondary date-bound guard as sessionization.
    */
  /** Events + `session_idx` (30-min-gap session numbering per user) —
    * the shared sessionized frame under [[sessionTexts]] and
    * [[dialogPairs]]. One user_id exchange; both windows share it.
    */
  private def withSessionIdx(events: DataFrame, gapMinutes: Int)
      : DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
             > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(byUser))
  }

  def sessionTexts(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    withSessionIdx(events, gapMinutes)
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        (unix_timestamp(max("ts")) - unix_timestamp(min("ts")))
          .as("duration_s"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          x => x.getField("event_type"))).as("seq"))
      .orderBy("user_id", "session_idx")
  }

  def sessionTextsSql(gapMinutes: Int = 30): String =
    s"""WITH lagged AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS prev_ts
       |  FROM events),
       |flags AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |    OR CAST(floor(epoch_ms(ts) / 1000.0) AS BIGINT)
       |       - CAST(floor(epoch_ms(prev_ts) / 1000.0) AS BIGINT)
       |       > ${gapMinutes * 60} THEN 1 ELSE 0 END AS new_session
       |  FROM lagged),
       |sess AS (
       |  SELECT *, CAST(sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
       |    AS session_idx
       |  FROM flags)
       |SELECT user_id, session_idx, count(*) AS n_events,
       |  CAST(floor(epoch_ms(max(ts)) / 1000.0) AS BIGINT)
       |    - CAST(floor(epoch_ms(min(ts)) / 1000.0) AS BIGINT)
       |    AS duration_s,
       |  string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
       |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Seq2seq pair construction over sessions: every event after the
    * first becomes a (context = space-joined prefix, response = next
    * event type) training pair — the standard next-action /
    * dialog-style dataset built from the same sessionized frame as
    * [[sessionTexts]]. The prefix is a running window aggregate inside
    * the (user, session) frame, so it shares the single user_id
    * exchange; per-row state is prefix-length-bounded.
    */
  def dialogPairs(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id", "session_idx")
      .orderBy("ts", "event_id")
    withSessionIdx(events, gapMinutes)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("context", concat_ws(" ",
        collect_list("event_type").over(
          w.rowsBetween(Window.unboundedPreceding, -1))))
      .filter(col("pos") > 1)
      .select(col("user_id"), col("session_idx"), col("pos"),
        col("context"), col("event_type").as("response"))
      .orderBy("user_id", "session_idx", "pos")
  }

  def dialogPairsSql(gapMinutes: Int = 30): String =
    s"""WITH lagged AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |      AS prev_ts
       |  FROM events),
       |flags AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |    OR CAST(floor(epoch_ms(ts) / 1000.0) AS BIGINT)
       |       - CAST(floor(epoch_ms(prev_ts) / 1000.0) AS BIGINT)
       |       > ${gapMinutes * 60} THEN 1 ELSE 0 END AS new_session
       |  FROM lagged),
       |sess AS (
       |  SELECT *, CAST(sum(new_session) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
       |    AS session_idx
       |  FROM flags),
       |pairs AS (
       |  SELECT user_id, session_idx,
       |    CAST(row_number() OVER (PARTITION BY user_id, session_idx
       |      ORDER BY ts, event_id) AS BIGINT) AS pos,
       |    string_agg(event_type, ' ') OVER (
       |      PARTITION BY user_id, session_idx ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS context,
       |    event_type AS response
       |  FROM sess)
       |SELECT * FROM pairs WHERE pos > 1
       |ORDER BY user_id, session_idx, pos""".stripMargin

  /** Half-life-per-day decayed engagement counts per (user, event
    * type) — the feature-store freshness weighting for ranking /
    * personalization training features. Weights are EXACT integers
    * (`1e6 div 2^Δdays`, shift arithmetic — no floating-point pow, so
    * the cross-engine hash is exact); the as-of day is data-derived
    * (max event day) and attaches as a 1-row broadcast. One
    * map-side-combinable aggregation; weight underflows to 0 past 20
    * days, bounding the effective horizon.
    */
  def decayedEngagement(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"), col("event_type"),
      // floor-division day key (shared SketchIndex.dayCol): Spark's
      // `div` truncates toward zero and would disagree with the
      // oracle's flooring `//` on pre-epoch timestamps
      graft.ext.SketchIndex.dayCol(col("ts")).as("day"))
    val asOf = broadcast(days.agg(max("day").as("as_of_day")))
    days.crossJoin(asOf)
      .withColumn("w", expr("1000000 div shiftleft(1, "
        + "cast(least(as_of_day - day, 20) as int))"))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum("w").as("decayed_micros"),
        min(expr("as_of_day - day")).as("days_since_last"))
      .orderBy("user_id", "event_type")
  }

  def decayedEngagementSql: String =
    """WITH days AS MATERIALIZED (
      |  SELECT user_id, event_type,
      |    epoch_ms(ts) // 86400000 AS day
      |  FROM events),
      |anchor AS (SELECT max(day) AS as_of_day FROM days)
      |SELECT user_id, event_type, count(*) AS n_events,
      |  CAST(sum(1000000 // (1 << least(as_of_day - day, 20)))
      |    AS BIGINT) AS decayed_micros,
      |  CAST(min(as_of_day - day) AS BIGINT) AS days_since_last
      |FROM days CROSS JOIN anchor
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Tumbling 1-hour event-time windows (batch twin of the streaming T-ops;
    * epoch-aligned so DuckDB date_trunc('hour') is the exact oracle).
    */
  def hourlyEventCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(unix_millis(col("w.start")).as("hour_start_ms"),
        col("event_type"), col("n"), col("total_value"))

  /** Dense hourly series with gaps zero-filled: the corpus contributes
    * ONE map-side-combinable count aggregate; the hour spine
    * (sequence over the min..max hour of the data) and the left join
    * against it are O(hours) post-aggregate frames — broadcast-sized at
    * any corpus scale, so gap-filling costs nothing beyond the count.
    * Integer hour ids (`unix_millis div 3600000`) keep both engines
    * exact. Empty input → empty output (null bounds explode to no rows).
    */
  def hourlyGapfill(events: DataFrame): DataFrame =
    gapfillSeries(events
      .select(expr("unix_millis(ts) div 3600000").as("hour_id"))
      .groupBy("hour_id").agg(count(lit(1)).as("n")))

  /** Gap-fill an already-aggregated `(hour_id, n)` counts frame (the
    * reusable core of [[hourlyGapfill]] — [[graft.streaming.AnomalyMonitor]]
    * feeds it the merged micro-batch count log).
    */
  def gapfillSeries(counts: DataFrame): DataFrame = {
    val spine = counts
      .agg(min("hour_id").as("lo"), max("hour_id").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("hour_id"))
    spine.join(counts, Seq("hour_id"), "left")
      .select(col("hour_id"),
        (col("hour_id") * 3600000L).as("hour_start_ms"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  val hourlyGapfillSql: String =
    """WITH c AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hour_id, count(*) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(hour_id) AS lo, max(hour_id) AS hi FROM c),
      |spine AS (SELECT unnest(range(lo, hi + 1)) AS hour_id FROM b)
      |SELECT s.hour_id, s.hour_id * 3600000 AS hour_start_ms,
      |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |FROM spine s LEFT JOIN c USING (hour_id)
      |ORDER BY hour_id""".stripMargin

  /** Semi/anti-join semantics (SURVEY.md §2.5): orders with vs without a
    * late shipment, counted by status — in ONE scan of `orders`. The
    * probe side is filter-pushed and pre-aggregated to distinct order
    * keys, so the left join never widens rows; a null-flag on the probe
    * key splits the two flows and a single group-by counts both. (The
    * semi + anti two-job formulation reads `orders` twice for the same
    * answer — 2× wasted fact IO at 100 TB.)
    */
  def ordersByLateShipment(t: Tables,
      cutoff: String = "2001-01-01 00:00:00"): DataFrame = {
    val late = t.lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(cutoff)))
      .select("l_orderkey").distinct()
    t.orders.join(late, col("o_orderkey") === col("l_orderkey"), "left")
      .select(when(col("l_orderkey").isNotNull, "with_late")
        .otherwise("without_late").as("flow"), col("o_orderstatus"))
      .groupBy("flow", "o_orderstatus").agg(count(lit(1)).as("n"))
  }

  /** Set ops over user populations: purchasers vs error-affected users.
    * Semantically INTERSECT/EXCEPT of two distinct sets, computed as ONE
    * scan + one shuffle (flag-per-user then conditional counts) instead of
    * four separate distinct+set-op jobs — the 100 TB-friendly shape.
    * Equivalence with Dataset.intersect/except is pinned in AnalyticsSpec.
    */
  def purchaseErrorSetOps(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("e"))
      .agg(
        count(when(col("p") === 1, 1)).as("n_purchasers"),
        count(when(col("e") === 1, 1)).as("n_errored"),
        count(when(col("p") === 1 && col("e") === 1, 1)).as("n_both"),
        count(when(col("p") === 1 && col("e") === 0, 1))
          .as("n_purchase_only"))

  /** Ranking-function breadth over per-customer revenue: dense_rank,
    * percent_rank and ntile quartiles under one total order (revenue
    * desc, custkey for tie-break determinism), top-k only.
    *
    * Scale shape: a global window over the full per-customer aggregate
    * would sort everything into ONE task. Instead: (revenue, custkey) is
    * a UNIQUE order, so for the top-k rows rank = dense_rank =
    * row_number, and percent_rank/ntile depend on the non-returned rows
    * only through the total count N — so the query is a two-phase top-k
    * (`orderBy.limit` plans as TakeOrderedAndProject: per-partition
    * top-k, merge of k-row heads) + a count aggregate broadcast in, and
    * the only unpartitioned window runs over ≤ k rows (constant,
    * independent of data size). Equality with the naive global-window
    * form is pinned in AnalyticsSpec.
    */
  def customerValueRanks(t: Tables, k: Int = 50): DataFrame = {
    val rev = t.orders.groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
    val top = rev.orderBy(col("revenue").desc, col("o_custkey")).limit(k)
    val total = rev.agg(count(lit(1)).as("n_total"))
    val w = Window.orderBy(col("revenue").desc, col("o_custkey"))
    val n = col("n_total")
    val rn = col("rn").cast("long")
    // SQL ntile(B): first N%B buckets hold N/B+1 rows, the rest N/B
    val nB = lit(4L)
    val base = floor(n / nB)
    val rem = n % nB
    val cutoff = rem * (base + 1)
    val quartile = when(rn <= cutoff,
        floor((rn - 1) / (base + 1)) + 1)
      .otherwise(rem + floor((rn - 1 - cutoff) / base) + 1)
    top.crossJoin(broadcast(total))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("o_custkey"), col("revenue"),
        col("rn").as("rk"), // unique order: dense_rank ≡ row_number
        when(n > 1, round((rn - 1).cast("double") / (n - 1), 6))
          .otherwise(lit(0.0)).as("pr"),
        quartile.cast("long").as("quartile"))
      .orderBy("rk") // ≤ k rows; matches the oracle's revenue-desc order
  }

  /** Pivot: incident counts by type × severity as columns (null cells
    * zero-filled to match the relational conditional-count equivalent).
    */
  def incidentPivot(incidents: DataFrame): DataFrame = {
    val sevs = graft.ops.Incidents.Severities
    val p = incidents.groupBy("incident_type")
      .pivot("severity", sevs).agg(count(lit(1)))
    p.select(col("incident_type") +:
      sevs.map(s => coalesce(col(s), lit(0L)).as(s)): _*)
  }

  /** Native `session_window` sessionization (gap-merged event-time
    * sessions, end = last event + gap). Unlike [[sessionsPerUser]]'s
    * manual lag/flag form this is Spark's own stateful-capable operator —
    * the same expression works under Structured Streaming with a
    * watermark. Timestamps kept at µs so the DuckDB gaps-and-islands
    * oracle is exact.
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"), col("total_value"))

  /** Sliding 1-hour windows every 30 min (each event lands in exactly
    * two windows). Spark's `window(ts, len, slide)` is epoch-aligned, so
    * the oracle reproduces starts with integer µs arithmetic.
    */
  def slidingWindowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("n"), col("n_users"))

  /** Keyless range join via [[graft.operators.RangeJoin]]: for every
    * purchase, the number of error events — from ANY user — in the 10
    * minutes leading up to it (platform-instability context for the
    * purchase). With no equi-key, Spark's native plan here is a
    * cartesian/BNLJ of purchases × errors; the bucketized join hashes
    * both sides on a 10-minute time bucket instead (each window covers
    * ≤ 2 buckets), then applies the exact BETWEEN as a post-filter —
    * candidates are time-neighbors only, within a constant of output
    * size. Inner-join semantics: calm-window purchases don't appear.
    */
  def errorsNearPurchases(events: DataFrame,
      lookbackMs: Long = 600000L): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(unix_millis(col("ts")).as("err_ms"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        (unix_millis(col("ts")) - lookbackMs).as("win_start"),
        unix_millis(col("ts")).as("win_end"))
    graft.operators.RangeJoin
      .pointInInterval(errors, purchases, "err_ms", "win_start", "win_end",
        bucketWidth = lookbackMs)
      .groupBy("purchase_id", "user_id")
      .agg(count(lit(1)).as("n_errors"))
  }

  /** Forward as-of: each purchase's NEXT error event by the same user
    * (post-purchase failure triage). Same single-shuffle cost as
    * [[purchaseAttribution]] — [[graft.operators.AsOfJoin.forward]] is
    * time-reversed backward.
    */
  def nextErrorAfterPurchase(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("purchase_ms"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), unix_millis(col("ts")).as("e_ms"),
        col("event_id").as("error_id"))
    graft.operators.AsOfJoin
      .forward(purchases, errors, Seq("user_id"), "purchase_ms", "e_ms",
        Seq("e_ms", "error_id"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("purchase_ms"), col("asof_error_id").as("error_id"),
        (col("asof_e_ms") - col("purchase_ms")).as("wait_ms"))
  }

  /** Last-touch attribution via [[graft.operators.AsOfJoin]]: every
    * purchase event picks up the same user's most recent click/view at or
    * before the purchase timestamp (NULL when the purchase is the user's
    * first touch). One shuffle of the events scan on user_id, one window
    * pass — no inequality join, no per-key candidate blow-up (operator
    * Scaladoc has the full cost model). Output timestamps as epoch ms
    * (cross-engine rule: never compare raw timestamps).
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val touches = events.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts"),
        col("event_id").as("touch_id"), col("event_type").as("touch_type"))
    graft.operators.AsOfJoin
      .backward(purchases, touches, Seq("user_id"), "ts", "ts",
        Seq("ts", "touch_id", "touch_type"))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_millis(col("ts")).as("purchase_ms"),
        col("asof_touch_id").as("touch_id"),
        col("asof_touch_type").as("touch_type"),
        (unix_millis(col("ts")) - unix_millis(col("asof_ts"))).as("gap_ms"))
  }

  /** Ordered conversion funnel view → click → purchase. A stage counts a
    * user only if it happened AT OR AFTER the user's entry into the
    * previous stage (t_click ≥ first view, t_purchase ≥ first qualifying
    * click) — plain per-type distinct counts would credit a purchase that
    * preceded the first view.
    *
    * Scale shape: three filtered user-keyed min-aggregates; each stage
    * joins the NEXT stage's filtered events against the per-user frontier
    * of the previous stage (≤ one row per user — shrinks monotonically
    * down the funnel). All joins are user-keyed equi-joins; the final
    * counts are three 1-row aggregates cross-joined (broadcast, O(1)).
    * Conversion ratios are exact-integer ppm, so the oracle compares
    * bit-for-bit.
    */
  def eventFunnel(events: DataFrame): DataFrame = {
    val s1 = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = events.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val s3 = events.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") >= col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    val u1 = s1.agg(count(lit(1)).as("u1"))
    val u2 = s2.agg(count(lit(1)).as("u2"))
    val u3 = s3.agg(count(lit(1)).as("u3"))
    u1.crossJoin(broadcast(u2)).crossJoin(broadcast(u3))
      .selectExpr(
        """stack(3,
          |  1L, 'view',     u1, 1000000L,
          |  2L, 'click',    u2, u2 * 1000000L div u1,
          |  3L, 'purchase', u3, u3 * 1000000L div u2
          |) AS (stage, stage_name, users, conv_ppm)""".stripMargin,
        "u1")
      .select(col("stage"), col("stage_name"), col("users"),
        col("conv_ppm"),
        expr("users * 1000000L div u1").as("funnel_ppm"))
  }

  /** DuckDB mirror of [[eventFunnel]]. */
  val eventFunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1),
      |c AS (
      |  SELECT (SELECT count(*) FROM s1) AS u1,
      |         (SELECT count(*) FROM s2) AS u2,
      |         (SELECT count(*) FROM s3) AS u3)
      |SELECT stage, stage_name, users, conv_ppm,
      |  users * 1000000 // u1 AS funnel_ppm
      |FROM (
      |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
      |    u1 AS users, CAST(1000000 AS BIGINT) AS conv_ppm, u1 FROM c
      |  UNION ALL
      |  SELECT 2, 'click', u2, u2 * 1000000 // u1, u1 FROM c
      |  UNION ALL
      |  SELECT 3, 'purchase', u3, u3 * 1000000 // u2, u1 FROM c)
      |ORDER BY stage""".stripMargin

  /** Weekly cohort retention: cohort = the week (unix epoch // 7 days) of
    * the user's first `signup` event; a cohort member is active at offset
    * k if they produced ANY event in cohort_week + k. Integer week ids
    * (`unix_millis div 604_800_000`) keep both engines exact and avoid
    * calendar/timezone semantics entirely.
    *
    * Scale shape: the activity stream collapses to distinct (user, week)
    * map-side BEFORE the cohort join (bounded by users × weeks, not by
    * events), the cohort frontier is one row per signed-up user, and the
    * final aggregate is (cohorts × offsets)-bounded. All shuffles are
    * user-keyed; nothing is ever globally sorted.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val wk = expr("unix_millis(ts) div 604800000")
    val cohort = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(wk).as("cohort_wk"))
    val active = events.select(col("user_id"), wk.as("wk")).distinct()
    active.join(cohort, "user_id")
      .filter(col("wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** DuckDB mirror of [[cohortRetention]]. */
  val cohortRetentionSql: String =
    """WITH cohort AS (
      |  SELECT user_id, min(epoch_ms(ts) // 604800000) AS cohort_wk
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |active AS (
      |  SELECT DISTINCT user_id, epoch_ms(ts) // 604800000 AS wk
      |  FROM events)
      |SELECT cohort_wk, wk - cohort_wk AS week_offset,
      |  count(*) AS active_users
      |FROM active JOIN cohort USING (user_id)
      |WHERE wk >= cohort_wk
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Rolling z-score anomaly detection over the gap-filled hourly event
    * series: each hour is scored against the mean/stddev of the previous
    * `lookback` hours. Built on [[hourlyGapfill]] so silent hours (n=0)
    * participate in the statistics — a frame over the raw (sparse)
    * hourly counts would skip exactly the hours an outage produces.
    *
    * Cross-engine determinism: the rolling frame aggregates INTEGER
    * sums (Σn, Σn²) — exact in any order — and the mean/variance/z are
    * derived from them with an identical expression tree in both
    * engines, then rounded to 6 dp. (Window `stddev_samp` would hit each
    * engine's own accumulation order — not reproducible.)
    *
    * Scale shape: the series is the O(hours) POST-aggregate frame
    * (hourlyGapfill's one map-side-combinable count is the only pass
    * over the corpus), so the single-partition ordered window is over
    * bounded data — same posture as the gap-fill spine itself. Output
    * keeps every fully-windowed hour with its score; `is_anomaly` flags
    * |z| ≥ zThresh, comparing on the ROUNDED z so the boundary decision
    * is identical in both engines.
    */
  def hourlyAnomalies(events: DataFrame, lookback: Int = 24,
      zThresh: Double = 3.0): DataFrame =
    scoreHourlySeries(hourlyGapfill(events), lookback, zThresh)

  /** Rolling-z scoring over a gap-filled `(hour_id, hour_start_ms, n)`
    * series (the reusable core of [[hourlyAnomalies]]).
    */
  def scoreHourlySeries(series: DataFrame, lookback: Int = 24,
      zThresh: Double = 3.0): DataFrame = {
    val w = Window.orderBy("hour_id").rowsBetween(-lookback, -1)
    series
      .withColumn("np", count(lit(1)).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .filter(col("np") === lookback)
      .withColumn("mean_n", col("s1").cast("double") / col("np"))
      .withColumn("var_n",
        (col("s2").cast("double") - col("s1").cast("double") * col("mean_n"))
          / (col("np") - lit(1)))
      .filter(col("var_n") > 0)
      .withColumn("z", round(
        (col("n").cast("double") - col("mean_n")) / sqrt(col("var_n")), 6))
      .select(col("hour_id"), col("hour_start_ms"), col("n"),
        round(col("mean_n"), 6).as("mean_n"), col("z"),
        (abs(col("z")) >= zThresh).cast("long").as("is_anomaly"))
  }

  /** DuckDB mirror of [[hourlyAnomalies]]. */
  def hourlyAnomaliesSql(lookback: Int = 24, zThresh: Double = 3.0): String =
    s"""WITH c AS (
       |  SELECT epoch_ms(ts) // 3600000 AS hour_id, count(*) AS n
       |  FROM events GROUP BY 1),
       |b AS (SELECT min(hour_id) AS lo, max(hour_id) AS hi FROM c),
       |spine AS (SELECT unnest(range(lo, hi + 1)) AS hour_id FROM b),
       |series AS (
       |  SELECT s.hour_id, s.hour_id * 3600000 AS hour_start_ms,
       |    CAST(coalesce(c.n, 0) AS BIGINT) AS n
       |  FROM spine s LEFT JOIN c USING (hour_id)),
       |rolled AS (
       |  SELECT *,
       |    count(*) OVER w AS np,
       |    sum(n) OVER w AS s1,
       |    sum(n * n) OVER w AS s2
       |  FROM series
       |  WINDOW w AS (ORDER BY hour_id
       |               ROWS BETWEEN $lookback PRECEDING AND 1 PRECEDING)),
       |derived AS (
       |  SELECT *,
       |    CAST(s1 AS DOUBLE) / np AS mean_n,
       |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
       |       * (CAST(s1 AS DOUBLE) / np)) / (np - 1) AS var_n
       |  FROM rolled WHERE np = $lookback)
       |SELECT hour_id, hour_start_ms, n,
       |  round(mean_n, 6) AS mean_n,
       |  round((CAST(n AS DOUBLE) - mean_n) / sqrt(var_n), 6) + 0 AS z,
       |  CAST(abs(round((CAST(n AS DOUBLE) - mean_n) / sqrt(var_n), 6))
       |       >= $zThresh AS BIGINT) AS is_anomaly
       |FROM derived WHERE var_n > 0
       |ORDER BY hour_id""".stripMargin
}
