package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage by deletion-neighborhood blocking (the
  * FastSS / SymSpell family — public literature): two strings within
  * Levenshtein distance 1 necessarily share a key in their delete-≤1
  * neighborhoods (substitution at i → both sides delete i; insertion /
  * deletion → the longer side's delete at the edit point equals the
  * shorter string itself). Exploding each DISTINCT key into its ≤
  * (len+1) deletion variants and equi-joining on the variant therefore
  * finds EVERY distance-≤1 pair with no pairwise comparison — recall is
  * guaranteed by construction, and the cheap Levenshtein verify on the
  * candidate set only removes the false candidates the blocking
  * admitted.
  *
  * Scale shape: dedup first (linkage blocks distinct KEYS, not
  * records), then the fan-out is ~len keys per distinct string — for
  * emails/names ≈ 20-30 short rows, all map-side. The only shuffles are
  * the variant equi-join and the pair distinct, both bounded by
  * neighborhood size × distinct keys. A degenerate hub variant (shared
  * by > `maxBlockDf` keys — e.g. blocking half the corpus through one
  * token) is dropped from BOTH sides before the join, bounding per-key
  * fan-in the same way MinHash banding caps bucket width; the verified
  * fixture query never trips the cap (proved by equality with the
  * brute-force DuckDB oracle).
  *
  * Distance > 1 needs delete-≤k neighborhoods (fan-out ~len^k/k!) —
  * at 100 TB run k=1 per pass and chain passes, or switch to q-gram
  * blocking; this operator deliberately fixes k=1.
  */
object FuzzyLink {

  /** Hub-variant cap: a deletion variant shared by more distinct keys
    * than this blocks nothing useful and is dropped from both sides.
    */
  val MaxBlockDf = 1024

  /** The string itself plus every single-character deletion. */
  def delKeys(key: Column): Column =
    array_distinct(concat(array(key),
      transform(sequence(lit(1), length(key)),
        i => concat(key.substr(lit(1), i - lit(1)),
          key.substr(i + lit(1), length(key) - i)))))

  /** DuckDB mirror of [[delKeys]] as a per-row UNNEST fragment. */
  def delKeysSql(expr: String): String =
    s"""list_distinct(list_prepend($expr,
       |    [substr($expr, 1, i - 1) || substr($expr, i + 1, len($expr) - i)
       |     for i in range(1, len($expr) + 1)]))""".stripMargin

  /** All (left key, right key) pairs within Levenshtein distance ≤ 1
    * (identical pairs excluded). `left`/`right` each contribute their
    * DISTINCT `keyCol` values.
    */
  def linkage(left: DataFrame, right: DataFrame,
      keyCol: String = "key",
      maxBlockDf: Int = MaxBlockDf): DataFrame = {
    val l = left.select(col(keyCol).as("lk")).distinct()
    val r = right.select(col(keyCol).as("rk")).distinct()
    val lb = l.select(col("lk"), explode(delKeys(col("lk"))).as("bk"))
    val rb = r.select(col("rk"), explode(delKeys(col("rk"))).as("bk"))
    val hot = lb.select(col("bk")).union(rb.select(col("bk")))
      .groupBy("bk").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxBlockDf)
      .select("bk")
    val cand = lb.join(broadcast(hot), Seq("bk"), "left_anti")
      .join(rb.join(broadcast(hot), Seq("bk"), "left_anti"), Seq("bk"))
      .select("lk", "rk").distinct()
    cand
      .filter(col("lk") =!= col("rk"))
      .withColumn("dist", levenshtein(col("lk"), col("rk")).cast("long"))
      .filter(col("dist") <= 1)
  }
}
