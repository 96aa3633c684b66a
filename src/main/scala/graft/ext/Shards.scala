package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Hashing.{h32, h32Sql}

/** Deterministic corpus sharding — the FINALIZATION step of a training
  * data pipeline: after curation, the corpus is "globally shuffled" and
  * written as N equal shards that trainers stream in order.
  *
  * The classic formulation sorts the whole corpus by a random key — a
  * full global sort of 100 TB. This one never sorts globally:
  *
  *   - shard(doc)    = salted_hash(doc_id) mod N  — a map-side
  *     projection; reproducible (salt-keyed), uniform, and stable under
  *     corpus growth (adding docs never moves an existing doc between
  *     shards, so shard-level caches/resumable readers survive appends);
  *   - order_key(doc) = an independent salted hash — the within-shard
  *     shuffle order. Sorting happens only WITHIN a shard's partition
  *     (`sortWithinPartitions`), so the exchange is one hash partition
  *     per shard and each task sorts only corpus/N rows.
  *
  * Together (shard, order_key) define the same uniformly-shuffled global
  * order a sort-by-random-key would give, at the cost of a hash exchange
  * instead of a global sort. The two hashes use distinct salts: a shared
  * salt would correlate shard membership with intra-shard position.
  *
  * Reference has no training-output surface; this extends the engine per
  * the BASELINE.json north-star (the write twin of [[Curation]]'s
  * dataset split).
  */
object Shards {

  /** Fixture shard count (production: hundreds to thousands — one
    * output file group per shard).
    */
  val DefaultShards = 16

  private val ShardSalt = "shard:"
  private val OrderSalt = "order:"

  /** Shard id of a doc-id column under `n` shards. */
  def shardOf(docId: Column, n: Int = DefaultShards): Column =
    pmod(h32(concat(lit(ShardSalt), docId.cast("string"))), lit(n.toLong))

  /** Within-shard shuffle position (independent salt). */
  def orderKeyOf(docId: Column): Column =
    h32(concat(lit(OrderSalt), docId.cast("string")))

  /** Corpus with shard assignment and order key attached — pure
    * map-side projection, no shuffle.
    */
  def assign(documents: DataFrame, n: Int = DefaultShards): DataFrame =
    documents.select(col("doc_id"), col("source"), col("lang"),
      col("n_chars"), col("text"),
      shardOf(col("doc_id"), n).as("shard"),
      orderKeyOf(col("doc_id")).as("order_key"))

  /** Per-shard manifest — the verified `shard_plan` query. Exact-integer
    * stats pin membership (id/order-key checksums), payload volume
    * (chars, whitespace tokens), and the order-key span trainers seek
    * within.
    */
  def shardSummary(documents: DataFrame, n: Int = DefaultShards)
      : DataFrame =
    assign(documents, n)
      .select(col("shard"), col("doc_id"), col("order_key"),
        col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        sum("doc_id").as("id_checksum"),
        sum("order_key").as("order_checksum"),
        min("order_key").as("min_order_key"),
        max("order_key").as("max_order_key"))

  def shardSummarySql(n: Int = DefaultShards): String = {
    val shard = s"${h32Sql(s"'$ShardSalt' || CAST(doc_id AS VARCHAR)")} % $n"
    val okey = h32Sql(s"'$OrderSalt' || CAST(doc_id AS VARCHAR)")
    s"""SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
       |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       |  CAST(sum(order_key) AS BIGINT) AS order_checksum,
       |  min(order_key) AS min_order_key,
       |  max(order_key) AS max_order_key
       |FROM (
       |  SELECT $shard AS shard, doc_id, $okey AS order_key, n_chars,
       |    len(string_split(text, ' ')) AS n_tokens
       |  FROM documents)
       |GROUP BY shard""".stripMargin
  }

  /** Write the corpus as `n` shards: one hash exchange keyed on the
    * shard id, a within-partition sort on (shard, order_key), and a
    * shard-partitioned parquet layout — each shard's rows land sorted
    * in that shard's own files; no stage ever sorts more than one
    * shard. Returns the written path.
    */
  def writeShards(documents: DataFrame, path: String,
      n: Int = DefaultShards): String = {
    assign(documents, n)
      .repartition(n, col("shard"))
      .sortWithinPartitions("shard", "order_key")
      .write.mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
    path
  }
}
