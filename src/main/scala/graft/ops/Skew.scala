package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation patterns (100 TB posture, SURVEY.md §7 risk register).
  *
  * AQE's skew-join split handles shuffle-join skew automatically; these
  * helpers cover the cases it does not: a skewed *aggregation* key, and a
  * skewed *broadcastable* join where one probe key dominates.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. The hot key's rows spread over `salts`
    * partitions in phase 1, so no single task owns the whole key; the
    * phase-2 input is `salts` rows per key — tiny. Result is identical
    * to a direct count (pinned in spec).
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("n"))

  /** Salted distinct-count: phase 1 dedupes (key, value) within salt
    * shards (map-side combine keeps hot keys bounded), phase 2 merges.
    * Exact, unlike approx_count_distinct; use the approx form when ±2 %
    * suffices at 100 TB.
    */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("v"),
        pmod(hash(value), lit(salts)).as("__salt"))
      .groupBy("key", "__salt")
      .agg(countDistinct(col("v")).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("n_distinct"))

  /** Salted equi-join for a skewed fact key against a non-broadcastable
    * build side: every fact row gets a deterministic salt in
    * [0, salts), the build side is replicated once per salt value, and
    * the join runs on (key, salt) — the hot key's probe rows spread over
    * `salts` tasks instead of one. This is the manual form of what AQE's
    * skew split does for sort-merge joins; it remains necessary when the
    * skew is known in advance (choose `salts` ∝ hot-key share) or the
    * join sits where AQE cannot re-plan. Row-for-row equal to the direct
    * join (pinned in ScaleSpec); cost = `salts`× the build side, so use
    * it when the build side is modest but above the broadcast threshold.
    *
    * `factSalt` must be deterministic but well-spread; hashing the whole
    * fact row avoids correlating with the join key.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, factKey: Column,
      buildKey: Column, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicatedBuild = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(replicatedBuild,
        factKey === buildKey && saltedFact("__salt") === replicatedBuild("__salt"))
      .drop("__salt")
  }

  /** Bloom-prefiltered equi-join: when the build side is selective but
    * above the broadcast threshold (say 10^8 distinct keys — a hash
    * relation of that would not broadcast, but its ~100 MB Bloom filter
    * will), ship a Bloom filter of the build keys to every fact task and
    * drop non-joining fact rows MAP-SIDE, before they are ever shuffled.
    * The exact join then runs on the surviving fraction; Bloom false
    * positives (rate `fpp`) survive the prefilter but are eliminated by
    * the join itself, so the result is row-for-row identical to the
    * direct join (pinned in ScaleSpec). This is the manual, composable
    * form of the runtime-filtering rewrite modern engines apply to
    * selective joins — here the filter construction is explicit, so it
    * can be built once and reused across queries.
    *
    * Cost model: one extra pass over the build side (the distributed
    * Bloom aggregation) + one broadcast of `-n·ln(fpp)/ln(2)²` bits;
    * payoff = (1 − selectivity) of the fact shuffle avoided. Worth it
    * when the join keeps ≪ half the fact side.
    */
  def bloomPrefilteredJoin(fact: DataFrame, build: DataFrame,
      factKey: Column, buildKey: Column,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // an undersized filter silently saturates (fpp -> 1: correct rows,
    // zero pruning) — so when the caller gives no capacity hint, size
    // from the actual build cardinality (one extra count over the side
    // we were going to scan anyway)
    val items =
      if (expectedItems > 0L) expectedItems
      else math.max(1L, build.select(buildKey.as("k")).na.drop().count())
    val keyType = build.select(buildKey.as("k")).schema.head.dataType
    val prefilter: Column = keyType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val bf = build.select(buildKey.cast("long").as("k")).na.drop()
          .stat.bloomFilter("k", items, fpp)
        val bc = fact.sparkSession.sparkContext.broadcast(bf)
        val f = udf((k: java.lang.Long) =>
          k != null && bc.value.mightContainLong(k))
        f(factKey.cast("long"))
      case StringType =>
        val bf = build.select(buildKey.as("k")).na.drop()
          .stat.bloomFilter("k", items, fpp)
        val bc = fact.sparkSession.sparkContext.broadcast(bf)
        val f = udf((k: String) =>
          k != null && bc.value.mightContainString(k))
        f(factKey)
      // other key types: skip pruning — the exact join still runs
      case _ => lit(true)
    }
    fact.filter(prefilter).join(build, factKey === buildKey)
  }
}
