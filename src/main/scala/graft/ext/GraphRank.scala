package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph centrality over the purchase graph.
  *
  * The reference has no graph operator; this is part of the
  * training-data-pipeline surface: link-style centrality is a standard
  * quality prior for web-crawl corpora (rank-weighted sampling), and the
  * same join-aggregate iteration skeleton serves any fixed-point graph
  * computation (label propagation, trust rank, harmonic influence).
  *
  * Determinism: the whole computation is integer fixed-point. Ranks live
  * in units of 1e-9 (Scale = 1e9 per node), per-edge contributions are
  * `(r * w) div outW` (floored integer division), damping is
  * `(85 * contrib) div 100`, teleport is `15 * Scale / 100`. DuckDB
  * mirrors every operation with `//`, so results hash-match exactly —
  * no float tolerance anywhere.
  *
  * Scale: one shuffle to build the weighted edge list, then per
  * iteration one join (edges ⋈ ranks on src — ranks is the smaller,
  * O(nodes) side) and one aggregation (contributions by dst). Edges are
  * computed once, persisted, and REUSED across iterations — the corpus
  * never reshuffles. On a cluster, hash-partition `edgesWithOut` by
  * `src` once so each iteration shuffles only the O(nodes) rank table.
  * Overflow ceiling: `r * w` needs total rank mass × max edge weight
  * < 2^63; with Scale=1e9 that holds to ~10^9 nodes at w ≤ 100 —
  * beyond that, drop Scale to 1e6.
  *
  * Reference provenance: none (novel surface); purchase graph derives
  * from the TPC-H-ish `orders`/`lineitem` fixtures (TESTDATA.md).
  */
object GraphRank {

  val Scale: Long   = 1000000000L
  val DampNum: Long = 85L
  val DampDen: Long = 100L
  val Teleport: Long = Scale * (DampDen - DampNum) / DampDen // 15% mass
  val Iters: Int    = 5
  val TopK: Int     = 25

  /** Node encoding keeps the bipartite graph in one keyspace:
    * customer c → 2c, supplier s → 2s+1.
    */
  private def custNode(c: Column): Column = c * 2L
  private def suppNode(s: Column): Column = s * 2L + 1L

  /** Weighted bidirectional purchase edges: one (customer, supplier)
    * edge per distinct pair, weight = number of lineitems, mirrored so
    * rank circulates in the bipartite graph.
    */
  def purchaseEdges(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val base = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("w"))
      .select(custNode(col("o_custkey")).as("src"),
        suppNode(col("l_suppkey")).as("dst"), col("w"))
    base.unionAll(base.select(col("dst").as("src"),
      col("src").as("dst"), col("w")))
  }

  /** Fixed-point weighted PageRank, `iters` synchronous iterations.
    * Returns (node, r) with r in Scale units.
    */
  def pageRank(edges: DataFrame, iters: Int = Iters): DataFrame = {
    val outw = edges.groupBy("src").agg(sum("w").as("outw"))
    // edges ⋈ out-weight computed ONCE and persisted: every iteration
    // reuses the materialized frame instead of re-deriving the edge list
    // from the corpus (5 iterations = 5 corpus scans otherwise)
    val en = edges.join(broadcast(outw), "src").persist()
    val nodes = en.select(col("src").as("node")).distinct().persist()
    var r = nodes.withColumn("r", lit(Scale))
    for (_ <- 1 to iters) {
      val contrib = en
        .join(broadcast(r.withColumnRenamed("node", "src")), "src")
        .withColumn("c", expr("(r * w) div outw"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("contrib"))
      // rank table is O(nodes) — broadcast it so the persisted edge
      // frame is never reshuffled; eager checkpoint truncates the
      // growing iteration lineage (same discipline as Dedup clustering)
      r = nodes.join(contrib, Seq("node"), "left")
        .withColumn("r", lit(Teleport)
          + expr(s"($DampNum * coalesce(contrib, 0L)) div $DampDen"))
        .select(col("node"), col("r"))
        .localCheckpoint(true)
    }
    en.unpersist(); nodes.unpersist()
    // the final fixed-point checkpoint outlives this call; release is
    // the enclosing query's job (no-op outside a harness scope)
    Scratch.track(r)
  }

  /** Verified query: top-[[TopK]] purchase-graph nodes by fixed-point
    * PageRank. Two-phase top-k (global TakeOrdered, then a ≤TopK-row
    * rank window) — no single-partition pass over the full node set.
    */
  def purchaseRank(orders: DataFrame, lineitem: DataFrame): DataFrame =
    topKOf(pageRank(purchaseEdges(orders, lineitem)))

  /** Materialize the rank table to parquet — the indexing-job leg of
    * the "index once, serve many" discipline ([[IndexCache]]): the
    * 5-iteration fixed point is the ingest job's cost; query serving is
    * a read of the O(nodes) artifact. Written as a handful of files —
    * the table is O(nodes), tiny next to the corpus it summarizes.
    */
  def writeRankIndex(orders: DataFrame, lineitem: DataFrame,
      path: String): Unit =
    pageRank(purchaseEdges(orders, lineitem))
      .coalesce(4).write.mode("overwrite").parquet(path)

  /** Serve [[purchaseRank]] from the persisted rank index — identical
    * rows to the in-flight computation (shares its oracle); per-query
    * cost is TakeOrdered over the O(nodes) artifact.
    */
  def purchaseRankServed(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    topKOf(spark.read.parquet(path))

  private def topKOf(r: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = r.orderBy(col("r").desc, col("node")).limit(TopK)
    val w = Window.orderBy(col("r").desc, col("node"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"),
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("node div 2").as("node_key"),
        col("r").as("score_fp"))
  }

  /** DuckDB mirror of [[purchaseRank]] — identical integer fixed-point
    * arithmetic (`//` ≡ Spark `div`), identical tie-breaks.
    */
  def purchaseRankSql(iters: Int = Iters, topK: Int = TopK): String = {
    def iterCte(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""r$i AS (
         |  SELECT n.node, CAST($Teleport
         |      + ($DampNum * COALESCE(c.contrib, 0)) // $DampDen
         |      AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT en.dst AS node,
         |      CAST(sum((p.r * en.w) // en.outw) AS BIGINT) AS contrib
         |    FROM en JOIN $prev p ON en.src = p.node GROUP BY 1) c
         |  USING (node))""".stripMargin
    }
    s"""WITH base AS (
       |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
       |    count(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT src, dst, w FROM base
       |  UNION ALL SELECT dst, src, w FROM base),
       |outw AS (
       |  SELECT src, CAST(sum(w) AS BIGINT) AS outw
       |  FROM edges GROUP BY 1),
       |en AS (
       |  SELECT e.src, e.dst, e.w, o.outw
       |  FROM edges e JOIN outw o USING (src)),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |r0 AS (SELECT node, CAST($Scale AS BIGINT) AS r FROM nodes),
       |${(1 to iters).map(iterCte).mkString(",\n")}
       |SELECT rank, node_type, node_key, score_fp FROM (
       |  SELECT row_number() OVER (ORDER BY r DESC, node) AS rank,
       |    CASE WHEN node % 2 = 0 THEN 'customer'
       |         ELSE 'supplier' END AS node_type,
       |    node // 2 AS node_key, r AS score_fp
       |  FROM r$iters)
       |WHERE rank <= $topK
       |ORDER BY rank""".stripMargin
  }
}
