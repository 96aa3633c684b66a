package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-release audits for structured tables that feed a training
  * corpus: k-anonymity (Sweeney 2002) and l-diversity (Machanavajjhala
  * et al. 2007) over a declared quasi-identifier set.
  *
  * Why this is an engine operator: a training-data pipeline that joins
  * account / profile tables into its corpus (the reference joins
  * customer attributes into curated events, reference
  * `spark/jobs/ingest_transform.py`) re-publishes every
  * quasi-identifier combination those tables carry. PII scrubbing
  * ([[Curation.piiScrubReport]]) removes DIRECT identifiers; these
  * audits measure the RE-IDENTIFICATION risk that survives scrubbing —
  * rows whose (nation, segment, balance-bucket)-style combination is
  * shared by fewer than k people are linkable against any outside
  * dataset carrying the same attributes, k-anonymous groups whose
  * sensitive attribute is constant still leak it (hence l-diversity).
  * The reports are release gates: a row landing in `rows_below` at the
  * release's k is a row the pipeline must generalize (coarser buckets),
  * suppress, or accept documented risk for.
  *
  * Scale: ONE shuffle each — the quasi-identifier groupBy (map-side
  * partial counts; group cardinality is the product of attribute
  * cardinalities, orders of magnitude below row count). The threshold
  * expansion cross-joins the GROUP-sized frame against the tiny literal
  * threshold list and re-aggregates by threshold — group-sized, never
  * row-sized, and the second exchange moves one row per (group,
  * threshold). No collect, no window over rows.
  */
object Privacy {

  /** Default k thresholds audited (k = 2 is "is anyone unique?"). */
  val KThresholds: Seq[Long] = Seq(2L, 5L, 10L, 25L)

  /** Default l thresholds audited (l = 2 is "is any group constant?"). */
  val LThresholds: Seq[Long] = Seq(2L, 3L, 5L)

  /** Per-threshold k-anonymity report over `qi` quasi-identifier
    * columns: for each k — how many QI groups are smaller than k, how
    * many rows live in them, the rows as integer ppm of the table, and
    * the table's overall k-anonymity level (the min group size; the
    * largest k for which the release IS k-anonymous). One row per
    * threshold, `ORDER BY k`.
    */
  def kAnonymityReport(table: DataFrame, qi: Seq[Column],
      ks: Seq[Long] = KThresholds): DataFrame = {
    val spark = table.sparkSession
    import spark.implicits._
    val sizes = table.groupBy(qi: _*)
      .agg(count(lit(1)).as("grp_n"))
      .select(col("grp_n"))
    sizes.crossJoin(broadcast(ks.toDF("k")))
      .groupBy(col("k"))
      .agg(
        sum(when(col("grp_n") < col("k"), lit(1L)).otherwise(lit(0L)))
          .as("groups_below"),
        sum(when(col("grp_n") < col("k"), col("grp_n"))
          .otherwise(lit(0L))).as("rows_below"),
        sum(col("grp_n")).as("total_rows"),
        min(col("grp_n")).as("k_anonymity"))
      .select(col("k"), col("groups_below"), col("rows_below"),
        // integer div on both engines (Spark `div`, DuckDB `//`):
        // double division would round vs truncate differently
        expr("rows_below * 1000000 div total_rows").as("rows_below_ppm"),
        col("k_anonymity"))
      .orderBy(col("k"))
  }

  /** Per-threshold l-diversity report: within each QI group, `l` =
    * distinct values of the sensitive column; for each threshold — how
    * many groups (and rows) have l below it, rows as integer ppm, and
    * the overall diversity level (min l; groups at l = 1 disclose the
    * sensitive value to anyone who can place a person in the group,
    * however large the group is). One row per threshold, `ORDER BY l`.
    */
  def lDiversityReport(table: DataFrame, qi: Seq[Column],
      sensitive: Column, ls: Seq[Long] = LThresholds): DataFrame = {
    val spark = table.sparkSession
    import spark.implicits._
    val groups = table.groupBy(qi: _*)
      .agg(count(lit(1)).as("grp_n"),
        count_distinct(sensitive).as("grp_l"))
      .select(col("grp_n"), col("grp_l"))
    groups.crossJoin(broadcast(ls.toDF("l")))
      .groupBy(col("l"))
      .agg(
        sum(when(col("grp_l") < col("l"), lit(1L)).otherwise(lit(0L)))
          .as("groups_below"),
        sum(when(col("grp_l") < col("l"), col("grp_n"))
          .otherwise(lit(0L))).as("rows_below"),
        sum(col("grp_n")).as("total_rows"),
        min(col("grp_l")).as("l_diversity"))
      .select(col("l"), col("groups_below"), col("rows_below"),
        expr("rows_below * 1000000 div total_rows").as("rows_below_ppm"),
        col("l_diversity"))
      .orderBy(col("l"))
  }

  /** The audited customer quasi-identifiers: nation × market segment ×
    * account-balance bucket (width [[BalanceBucket]]). `floor` of a
    * DOUBLE ratio is exact in both engines for these magnitudes
    * (|acctbal| < 10⁴, bucket width 10³ → quotients far inside the
    * 2⁵³ lattice).
    */
  val BalanceBucket = 1000.0

  private def balanceBucket: Column =
    floor(col("c_acctbal") / lit(BalanceBucket)).cast("long")

  /** k-anonymity of the customer table under the default QI set. */
  def customerKAnonymity(customer: DataFrame): DataFrame =
    kAnonymityReport(customer,
      Seq(col("c_nationkey"), col("c_mktsegment"), balanceBucket))

  /** l-diversity of the market segment (sensitive) against nation ×
    * balance-bucket (the QI a linking attacker brings).
    */
  def customerLDiversity(customer: DataFrame): DataFrame =
    lDiversityReport(customer,
      Seq(col("c_nationkey"), balanceBucket), col("c_mktsegment"))

  /** DuckDB mirror of [[customerKAnonymity]]. */
  def customerKAnonymitySql: String =
    s"""WITH sizes AS (
       |  SELECT count(*) AS grp_n
       |  FROM customer
       |  GROUP BY c_nationkey, c_mktsegment,
       |    CAST(floor(c_acctbal / $BalanceBucket) AS BIGINT)),
       |ks AS (SELECT CAST(unnest(
       |  ${KThresholds.mkString("[", ", ", "]")}) AS BIGINT) AS k)
       |SELECT k,
       |  CAST(sum(CASE WHEN grp_n < k THEN 1 ELSE 0 END) AS BIGINT)
       |    AS groups_below,
       |  CAST(sum(CASE WHEN grp_n < k THEN grp_n ELSE 0 END) AS BIGINT)
       |    AS rows_below,
       |  CAST(sum(CASE WHEN grp_n < k THEN grp_n ELSE 0 END) * 1000000
       |    // CAST(sum(grp_n) AS BIGINT) AS BIGINT) AS rows_below_ppm,
       |  min(grp_n) AS k_anonymity
       |FROM sizes CROSS JOIN ks
       |GROUP BY k
       |ORDER BY k""".stripMargin

  /** DuckDB mirror of [[customerLDiversity]]. */
  def customerLDiversitySql: String =
    s"""WITH groups AS (
       |  SELECT count(*) AS grp_n,
       |    count(DISTINCT c_mktsegment) AS grp_l
       |  FROM customer
       |  GROUP BY c_nationkey,
       |    CAST(floor(c_acctbal / $BalanceBucket) AS BIGINT)),
       |ls AS (SELECT CAST(unnest(
       |  ${LThresholds.mkString("[", ", ", "]")}) AS BIGINT) AS l)
       |SELECT l,
       |  CAST(sum(CASE WHEN grp_l < l THEN 1 ELSE 0 END) AS BIGINT)
       |    AS groups_below,
       |  CAST(sum(CASE WHEN grp_l < l THEN grp_n ELSE 0 END) AS BIGINT)
       |    AS rows_below,
       |  CAST(sum(CASE WHEN grp_l < l THEN grp_n ELSE 0 END) * 1000000
       |    // CAST(sum(grp_n) AS BIGINT) AS BIGINT) AS rows_below_ppm,
       |  min(grp_l) AS l_diversity
       |FROM groups CROSS JOIN ls
       |GROUP BY l
       |ORDER BY l""".stripMargin
}
