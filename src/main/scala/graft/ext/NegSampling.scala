package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Hashing._

/** Implicit-feedback negative sampling — the recommender-training
  * counterpart of [[Similarity.hardNegatives]]: for each user, k items
  * they have NOT interacted with, drawn by a deterministic hash so the
  * sample is reproducible (and oracle-checkable) with zero RNG state.
  *
  * Scale shape: candidate generation is a map-side explode (m hash
  * draws per user — no item-table join to draw); the only corpus-sized
  * work is the anti-join of candidates against the interaction set on
  * (user, item) — one hash-partitioned shuffle each side, exactly the
  * partitioning a bucketed interactions table already has. The final
  * keep-first-k is a per-user window over ≤ m candidate rows.
  * Over-generation m = 4k draws bounds the miss probability: a user
  * covering ≤ half the catalog loses a draw with p ≤ 1/2, so k of 4k
  * draws survive with overwhelming probability; degenerate users who
  * covered nearly everything legitimately yield fewer than k.
  */
object NegSampling {

  /** Negatives per user. */
  val NegK = 3

  /** Hash draws per user (over-generation factor 4). */
  val NegDraws = 12

  def negativeSamples(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, part: DataFrame): DataFrame = {
    // the distinct's exchange, made EXPLICIT at the session's shuffle
    // parallelism: the (custkey, partkey) rows are bytes-light but
    // md5-hash/dedup-heavy, so AQE's byte-based coalescing (advisory
    // 64 MB) folds the post-shuffle distinct + anti-join chain into
    // ONE task (r18 profile: an 879 ms single-task stage reading the
    // whole 8.4 MB exchange). A user-specified partition count is
    // exempt from AQE coalescing and pins the join's other side to
    // match. Scale-neutral: this is the same hash exchange the plan
    // runs anyway, and at production volume AQE would not have
    // coalesced it.
    val interactions = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c_custkey"),
        col("l_partkey").as("p_partkey"))
      .repartition(orders.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt,
        col("c_custkey"), col("p_partkey"))
      .distinct()
    val nParts = broadcast(
      part.agg(max("p_partkey").cast("long").as("n_parts")))
    val cands = customer.select(col("c_custkey"))
      .crossJoin(nParts)
      .select(col("c_custkey"), col("n_parts"),
        explode(sequence(lit(1L), lit(NegDraws.toLong))).as("seq"))
      .select(col("c_custkey"), col("seq"),
        (h32(concat(lit("neg|"), col("c_custkey").cast("string"),
          lit("|"), col("seq").cast("string"))) % col("n_parts") + 1L)
          .as("p_partkey"))
      // two draws can hash to the same item; dedup on (user, item)
      // keeping the earliest draw so the first-k negatives are k
      // DISTINCT items (the over-generation bound assumes distinct
      // draws). Keyed like the anti-join below, so the join reuses
      // this exchange's partitioning — no extra shuffle.
      .groupBy("c_custkey", "p_partkey").agg(min("seq").as("seq"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_custkey").orderBy("seq")
    cands
      .join(interactions, Seq("c_custkey", "p_partkey"), "left_anti")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= NegK)
      .select(col("c_custkey"), col("rank"), col("p_partkey"),
        col("seq"))
      .orderBy("c_custkey", "rank")
  }

  /** DuckDB mirror of [[negativeSamples]]. Draws use the shared
    * [[Hashing.h32]] md5-prefix hash, so the sample is bit-identical.
    */
  def negativeSamplesSql: String =
    s"""WITH np AS (
       |  SELECT CAST(max(p_partkey) AS BIGINT) AS n_parts FROM part),
       |inter AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey AS c_custkey,
       |    l_partkey AS p_partkey
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |cands AS MATERIALIZED (
       |  SELECT c_custkey, p_partkey, min(seq) AS seq
       |  FROM (
       |    SELECT c_custkey, seq,
       |      ${h32Sql("'neg|' || CAST(c_custkey AS VARCHAR) || '|' " +
              "|| CAST(seq AS VARCHAR)")} % n_parts + 1 AS p_partkey
       |    FROM customer
       |    CROSS JOIN np
       |    CROSS JOIN (SELECT unnest(generate_series(1, $NegDraws))
       |                AS seq))
       |  GROUP BY 1, 2),
       |kept AS (
       |  SELECT c.*, row_number() OVER (PARTITION BY c_custkey
       |    ORDER BY seq) AS rank
       |  FROM cands c ANTI JOIN inter i
       |    ON c.c_custkey = i.c_custkey
       |    AND c.p_partkey = i.p_partkey)
       |SELECT c_custkey, rank, p_partkey, seq FROM kept
       |WHERE rank <= $NegK ORDER BY c_custkey, rank""".stripMargin
}
