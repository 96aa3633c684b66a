package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic CustomerEvent stream synthesized from the `events` fixture.
  *
  * The reference's wire schema is the 10-field CustomerEvent record
  * (reference: kafka/schemas/customer_events.avsc:1-71, redeclared at
  * spark/jobs/ingest_transform.py:85-98) produced by a seeded generator with
  * anomaly injection — late backdating 1-24h at 5%, missing optional fields,
  * schema drift v2/v3 every ~100 events (kafka/producer/produce_events.py:
  * 129-184). The driver testdata has no such table, so we derive one, purely
  * column-expression-deterministically, from `events` — the same derivation
  * is expressed in DuckDB SQL ([[sqlCte]]) so every downstream operator is
  * oracle-verifiable.
  *
  * Injection rates (on event_id): null id 1/97, null name 1/101, null email
  * 1/89, invalid email 1/53, null country 1/50, invalid country 1/67, null
  * plan 1/71 (plan domain itself carries 'invalid_plan' for user_id%5==4),
  * future event +48h 1/61, stale backdate 26h 1/103 (breaches the E12
  * freshness lower bound; the regular 1-21h backdates never do), late
  * backdate 1-24h 1/20, drift v2 1/100 v3 1/200.
  */
object CustomerEvents {

  /** Deterministic stand-in for processing/current time in verified queries
    * (reference uses current_timestamp(); SURVEY.md §7 determinism rule).
    * All fixture events are < 2024-02-01.
    */
  val AsOf = "2024-02-01 00:00:00"
  val AsOfSql = s"TIMESTAMP '$AsOf'"
  def asOfCol: Column = to_timestamp(lit(AsOf))

  val Countries: Seq[String] =
    Seq("US", "CA", "GB", "DE", "FR", "AU", "JP", "IN", "BR", "MX")
  val Plans: Seq[String] = Seq("free", "basic", "premium", "enterprise")

  /** reference: spark/jobs/ingest_transform.py:230-233 */
  val EmailRegex = "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"

  /** reference: spark/jobs/ingest_transform.py:182-195 */
  val RegionMap: Seq[(String, String)] = Seq(
    "US" -> "North America", "CA" -> "North America", "MX" -> "North America",
    "GB" -> "Europe", "DE" -> "Europe", "FR" -> "Europe",
    "AU" -> "APAC", "JP" -> "APAC", "IN" -> "APAC",
    "BR" -> "South America")

  /** Synthesize the CustomerEvent frame from the `events` table.
    * Carries `event_id` (stable sort/join key) and `processing_timestamp`
    * (the fixture `ts`, standing in for arrival time).
    */
  def synth(events: DataFrame): DataFrame = {
    val uid = col("user_id")
    val eid = col("event_id")
    val tsMs = unix_millis(col("ts"))

    val country = when(eid % 50 === 0, lit(null: String))
      .when(eid % 67 === 0, lit("XX"))
      .otherwise(
        Countries.zipWithIndex.foldLeft(lit(null: String)) {
          case (acc, (c, i)) => when(uid % 10 === i, lit(c)).otherwise(acc)
        })

    val plan = when(eid % 71 === 0, lit(null: String))
      .otherwise(
        when(uid % 5 === 0, "free").when(uid % 5 === 1, "basic")
          .when(uid % 5 === 2, "premium").when(uid % 5 === 3, "enterprise")
          .otherwise("invalid_plan"))

    val eventTs = tsMs + when(eid % 61 === 0, lit(172800000L))
      .when(eid % 103 === 0, lit(-93600000L)) // stale: 26 h, breaches E12
      .when(eid % 20 === 0, -(lit(1L) + eid % 24) * 3600000L)
      .otherwise(lit(0L))

    val version = when(eid % 200 === 0, 3L)
      .when(eid % 100 === 0, 2L).otherwise(1L)

    events.select(
      eid.as("event_id"),
      col("ts").as("processing_timestamp"),
      when(eid % 97 === 0, lit(null: String))
        .otherwise(concat(lit("cust_"), uid.cast("string"))).as("id"),
      when(eid % 101 === 0, lit(null: String))
        .otherwise(concat(lit("user_"), uid.cast("string"))).as("name"),
      when(eid % 89 === 0, lit(null: String))
        .when(eid % 53 === 0, lit("invalid-email"))
        .otherwise(concat(
          lit("user_"), uid.cast("string"), lit("@example"),
          (uid % 5).cast("string"), lit(".com"))).as("email"),
      (tsMs - ((uid % 730) + 1) * 86400000L).as("signup_ts"),
      country.as("country"),
      plan.as("plan"),
      eventTs.as("event_ts"),
      version.as("version"),
      when(eid % 100 === 0, uid % 2 === 0)
        .otherwise(lit(null: java.lang.Boolean)).as("marketing_opt_in"),
      when(eid % 200 === 0,
        when(uid % 3 === 0, "high_value").when(uid % 3 === 1, "standard")
          .otherwise("churn_risk"))
        .otherwise(lit(null: String)).as("customer_segment"))
  }

  /** The identical derivation in DuckDB SQL, as a WITH-clause body named
    * `ce`. Prepend to oracle queries: s"WITH ce AS ($sqlCte) SELECT ...".
    */
  val sqlCte: String = """
    SELECT
      event_id,
      ts AS processing_timestamp,
      CASE WHEN event_id % 97 = 0 THEN NULL
           ELSE 'cust_' || CAST(user_id AS VARCHAR) END AS id,
      CASE WHEN event_id % 101 = 0 THEN NULL
           ELSE 'user_' || CAST(user_id AS VARCHAR) END AS name,
      CASE WHEN event_id % 89 = 0 THEN NULL
           WHEN event_id % 53 = 0 THEN 'invalid-email'
           ELSE 'user_' || CAST(user_id AS VARCHAR) || '@example' ||
                CAST(user_id % 5 AS VARCHAR) || '.com' END AS email,
      epoch_ms(ts) - ((user_id % 730) + 1) * 86400000 AS signup_ts,
      CASE WHEN event_id % 50 = 0 THEN NULL
           WHEN event_id % 67 = 0 THEN 'XX'
           ELSE CASE user_id % 10
             WHEN 0 THEN 'US' WHEN 1 THEN 'CA' WHEN 2 THEN 'GB'
             WHEN 3 THEN 'DE' WHEN 4 THEN 'FR' WHEN 5 THEN 'AU'
             WHEN 6 THEN 'JP' WHEN 7 THEN 'IN' WHEN 8 THEN 'BR'
             ELSE 'MX' END END AS country,
      CASE WHEN event_id % 71 = 0 THEN NULL
           ELSE CASE user_id % 5
             WHEN 0 THEN 'free' WHEN 1 THEN 'basic' WHEN 2 THEN 'premium'
             WHEN 3 THEN 'enterprise' ELSE 'invalid_plan' END END AS plan,
      epoch_ms(ts) + CASE WHEN event_id % 61 = 0 THEN 172800000
                          WHEN event_id % 103 = 0 THEN -93600000
                          WHEN event_id % 20 = 0
                            THEN -(1 + event_id % 24) * 3600000
                          ELSE 0 END AS event_ts,
      CAST(CASE WHEN event_id % 200 = 0 THEN 3
           WHEN event_id % 100 = 0 THEN 2 ELSE 1 END AS BIGINT) AS version,
      CASE WHEN event_id % 100 = 0 THEN (user_id % 2 = 0)
           ELSE NULL END AS marketing_opt_in,
      CASE WHEN event_id % 200 = 0 THEN
             CASE user_id % 3 WHEN 0 THEN 'high_value'
               WHEN 1 THEN 'standard' ELSE 'churn_risk' END
           ELSE NULL END AS customer_segment
    FROM events"""

  /** SQL snippet: the enriched frame (region/email_domain/age/flags) on top
    * of `ce` — mirror of [[graft.enrich.Enrich.curated]]. Timestamps are
    * built with make_timestamp(µs) (naive, timezone-proof in DuckDB).
    */
  val sqlCuratedCte: String = {
    val regionCase = RegionMap
      .map { case (c, r) => s"WHEN country = '$c' THEN '$r'" }
      .mkString("CASE ", " ", " ELSE 'Other' END")
    val signupTs = "make_timestamp(CAST(floor(signup_ts / 1000.0) AS BIGINT) * 1000000)"
    val eventTs = "make_timestamp(CAST(floor(event_ts / 1000.0) AS BIGINT) * 1000000)"
    s"""
    SELECT ce.*,
      $signupTs AS signup_timestamp,
      $eventTs AS event_timestamp,
      $regionCase AS region,
      regexp_extract(email, '@(.+)', 1) AS email_domain,
      CAST(date_diff('day', $signupTs, processing_timestamp) AS BIGINT)
        AS customer_age_days,
      (version > 1) AS schema_drift_detected,
      CASE WHEN CAST(floor(epoch_ms(processing_timestamp) / 1000.0) AS BIGINT)
              - CAST(floor(event_ts / 1000.0) AS BIGINT) > 900
           THEN true ELSE false END AS is_late_arrival,
      COALESCE(regexp_matches(email,
        '^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$$'), false)
        AS dq_email_valid,
      (id IS NOT NULL) AS dq_id_not_null,
      COALESCE($eventTs <= $AsOfSql, false) AS dq_timestamp_valid,
      COALESCE(plan IN ('free','basic','premium','enterprise'), false)
        AS dq_plan_valid
    FROM ce"""
  }

  /** Full curated CTE chain for oracle SQL: WITH ce AS (...), cur0 AS
    * (...), cur AS (cur0 + dq_passed). Use as s"$sqlWith SELECT ... FROM cur".
    */
  val sqlWith: String =
    s"""WITH ce AS ($sqlCte), cur0 AS ($sqlCuratedCte), cur AS (
       |  SELECT cur0.*,
       |    (dq_email_valid AND dq_id_not_null AND dq_timestamp_valid
       |      AND dq_plan_valid) AS dq_passed
       |  FROM cur0)""".stripMargin
}
