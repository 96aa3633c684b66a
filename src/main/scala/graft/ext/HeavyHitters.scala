package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed Misra–Gries heavy hitters (Misra & Gries 1982; merge
  * property per Agarwal et al. 2013, "Mergeable Summaries" — public
  * literature): every partition runs the k-counter sketch over its
  * symbol stream, the ≤ k·partitions surviving counters merge by plain
  * summation, and the classic guarantees survive the merge:
  *
  *   1. est(t) ≤ exact(t), and exact(t) − est(t) ≤ N/(k+1)
  *      (each partition's decrement rounds d_i ≤ N_i/(k+1); errors add
  *      to at most Σ N_i/(k+1) = N/(k+1));
  *   2. any symbol with exact(t) > N/(k+1) MUST survive somewhere
  *      (its count beats some partition's decrement budget), so true
  *      heavy hitters are never lost.
  *
  * The verified query emits exactly these two theorems as booleans per
  * symbol — the DuckDB oracle computes the exact side and `true`, so a
  * partitioning-dependent estimate can never leak into the compare
  * while the bounds themselves are driver-checked.
  *
  * North-star extension (BASELINE.json); no reference counterpart.
  *
  * Scale shape: THIS is the 100 TB shape for "top symbols" — the exact
  * groupBy ships every distinct key through a shuffle; the sketch
  * ships ≤ k counters per partition (k·partitions rows total,
  * independent of N and of the key cardinality) into one narrow merge.
  * The exact aggregate here exists only to verify the bounds; the
  * production call is [[mergedCounters]] alone. mapPartitions is the
  * genuinely imperative per-partition case (bounded mutable counter
  * state) — no Catalyst aggregate expresses "decrement all on
  * overflow".
  *
  * The fixture symbol stream is the first letter of every token —
  * naturally Zipf-ish (19 symbols, one above the N/(k+1) line at k=6)
  * where the token stream itself is near-uniform by construction.
  */
object HeavyHitters {

  /** Counter budget: 6 counters over 19 fixture symbols forces real
    * decrement pressure while keeping one guaranteed heavy hitter.
    */
  val Counters = 6

  /** The skewed symbol stream: first letter of each token. */
  def symbolStream(documents: DataFrame): Dataset[String] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(explode(split(col("text"), " ")).as("t"))
      .select(substring(col("t"), 1, 1).as("c"))
      .filter(col("c") =!= "")
      .as[String]
  }

  /** Per-partition Misra–Gries, counters merged by summation — the
    * production surface: O(k) state per partition, ≤ k·partitions rows
    * shuffled, regardless of stream length or key cardinality.
    */
  def mergedCounters(syms: Dataset[String], k: Int = Counters)
      : DataFrame = {
    val spark = syms.sparkSession
    import spark.implicits._
    syms.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { s =>
        m.get(s) match {
          case Some(c) => m.update(s, c + 1)
          case None if m.size < k => m.update(s, 1L)
          case None =>
            // overflow: decrement every counter, dropping zeros (one
            // round charges <= 1 error to every symbol incl. s)
            val survivors = m.toList.collect {
              case (t, c) if c > 1 => (t, c - 1)
            }
            m.clear()
            m ++= survivors
        }
      }
      m.iterator
    }.toDF("symbol", "est")
      .groupBy("symbol").agg(sum("est").as("est"))
  }

  /** Bound-verification report: one row per distinct symbol with the
    * exact count and the two MG theorems as booleans (both provably
    * true for ANY partitioning — the partitioning-dependent estimate
    * itself stays out of the compared columns).
    */
  def report(documents: DataFrame, k: Int = Counters): DataFrame = {
    val syms = symbolStream(documents)
    val exact = syms.toDF("symbol").groupBy("symbol")
      .agg(count(lit(1)).as("exact_n"))
    val total = exact.agg(sum("exact_n").as("n_total"))
    val est = mergedCounters(syms, k)
    exact
      .join(est, Seq("symbol"), "left")
      .crossJoin(broadcast(total))
      .select(col("symbol"), col("exact_n"),
        (col("exact_n") * (k + 1) > col("n_total")).as("must_capture"),
        when(col("est").isNotNull,
          col("est") <= col("exact_n")
            && (col("exact_n") - col("est")) * (k + 1) <= col("n_total"))
          .otherwise(col("exact_n") * (k + 1) <= col("n_total"))
          .as("bound_ok"))
      .orderBy(col("exact_n").desc, col("symbol"))
  }

  /** The streamed-index twin of [[report]]: estimates come from
    * SUMMING the per-batch Misra–Gries counters persisted by
    * [[graft.streaming.HeavyHitterStream]] (mergeable summaries), and
    * the same two theorems are checked against the exact stream
    * counts. `indexPath` must already hold the batch partitions; the
    * exact side re-scans the documents only to verify the bounds —
    * production serves [[graft.streaming.HeavyHitterStream
    * .servedCounters]] alone.
    */
  def servedReport(documents: DataFrame, indexPath: String,
      k: Int = Counters): DataFrame = {
    val spark = documents.sparkSession
    val exact = symbolStream(documents).toDF("symbol").groupBy("symbol")
      .agg(count(lit(1)).as("exact_n"))
    val total = exact.agg(sum("exact_n").as("n_total"))
    val est = graft.streaming.HeavyHitterStream
      .servedCounters(spark, indexPath)
    exact
      .join(est, Seq("symbol"), "left")
      .crossJoin(broadcast(total))
      .select(col("symbol"), col("exact_n"),
        (col("exact_n") * (k + 1) > col("n_total")).as("must_capture"),
        when(col("est").isNotNull,
          col("est") <= col("exact_n")
            && (col("exact_n") - col("est")) * (k + 1) <= col("n_total"))
          .otherwise(col("exact_n") * (k + 1) <= col("n_total"))
          .as("bound_ok"))
      .orderBy(col("exact_n").desc, col("symbol"))
  }

  /** DuckDB mirror of [[report]]: the exact side plus literal `true`
    * for the theorem column (the [[graft.SparkEntry]] `approx_sketches`
    * error-bound-oracle pattern).
    */
  def reportSql(k: Int = Counters): String =
    s"""WITH s AS (
       |  SELECT substr(unnest(string_split(text, ' ')), 1, 1) AS symbol
       |  FROM documents),
       |exact AS (
       |  SELECT symbol, count(*) AS exact_n FROM s
       |  WHERE symbol != '' GROUP BY 1),
       |tot AS (SELECT CAST(sum(exact_n) AS BIGINT) AS n_total FROM exact)
       |SELECT symbol, exact_n,
       |  exact_n * ${k + 1} > n_total AS must_capture,
       |  true AS bound_ok
       |FROM exact CROSS JOIN tot
       |ORDER BY exact_n DESC, symbol""".stripMargin
}
