package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Hashing._
import Dedup.{dot, norm}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` column): brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane-LSH bucketed variant as the scale
  * path. Extends the reference per BASELINE.json's north-star.
  *
  * Scale design: the query set is small and broadcast, so the baseline is
  * a broadcast nested-loop with map-side scoring + per-query top-k — no
  * shuffle of the corpus. The LSH variant hashes the corpus to sign
  * buckets map-side (deterministic hyperplanes derived from md5, so the
  * DuckDB oracle computes identical buckets) and only scores within the
  * query's bucket: at 100 TB the bucket join replaces the full scan per
  * query, the classic IVF/LSH trade. Cosine math is zip_with/aggregate
  * array expressions — native Catalyst, no UDF.
  */
object Similarity {

  /** Queries = this many lowest vec_ids; small fixed probe set. */
  val NumQueries = 10

  /** Neighbors returned per query. */
  val TopK = 5

  /** Number of LSH hyperplanes (bucket bits). */
  val NumPlanes = 8

  private def withNorm(embeddings: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    embeddings
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
  }

  // ---- brute-force top-k --------------------------------------------------

  /** Exact cosine top-k for each query vector. The corpus side never
    * shuffles: queries are broadcast, scoring is map-side, and only the
    * (n_queries × k)-bounded ranked rows move.
    */
  def topKBruteForce(embeddings: DataFrame): DataFrame = {
    val e = withNorm(embeddings)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("label"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id"), col("label"),
        col("cosine"))
  }

  def topKBruteForceSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding,
       |    sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
       |                   for x in embedding])) AS nrm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id, e.label,
       |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)
       |                    * CAST(e.embedding[i] AS DOUBLE)
       |                    for i in range(1, len(q.embedding) + 1)])
       |      / (q.nrm * e.nrm), 6) AS cosine
       |  FROM e q JOIN e ON e.vec_id != q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |SELECT q_id, rank, vec_id, label, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  // ---- random-hyperplane LSH ----------------------------------------------

  /** Embedding dimensionality of the fixture corpus. */
  val Dim = 64

  /** Deterministic hyperplane components, uniform in [-1, 1), derived
    * from md5 ONCE on the driver ([[Hashing.jvmH32]]) and embedded as
    * literals in both the Spark plan and the oracle SQL — per-row hash
    * work would be pure waste for constants. The integer is embedded (not
    * a decimal string) so both engines perform the identical IEEE
    * division.
    */
  def planeInt(h: Int, d: Int): Long = jvmH32(s"hp:$h:$d")

  private def planeLit(h: Int): Column =
    array((0 until Dim).map(d =>
      lit(planeInt(h, d) / 2147483648.0 - 1.0)): _*)

  /** Sign-bucket id: bit h set iff dot(v, plane_h) > 0; map-side. */
  def bucketExpr(v: Column): Column =
    (0 until NumPlanes).map { h =>
      when(dot(v, planeLit(h)) > 0, 1L << h).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only candidates in the query's bucket.
    * Returns per-query bucket size (`n_candidates`) alongside the top-k,
    * making recall-vs-work visible. Queries with an otherwise-empty
    * bucket return no rows (standard single-probe LSH semantics).
    */
  def topKLsh(embeddings: DataFrame): DataFrame = {
    val e = withNorm(embeddings).withColumn("bucket", bucketExpr(col("v")))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("q_bucket"))
    val scored = e.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("n_candidates", count(lit(1)).over(Window.partitionBy("q_id")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cosine"),
        col("n_candidates"))
  }

  /** IVF parameters: number of coarse cells and probed cells per query. */
  val IvfCells = 16
  val IvfProbes = 2

  /** IVF-style ANN: assign every vector to its nearest of [[IvfCells]]
    * coarse centroids (deterministically seeded: the lowest vec_ids serve
    * as centroids — a k-means iteration would refine them offline), then
    * search only the [[IvfProbes]] cells nearest each query. The inverted
    * file (cell → vectors) is exactly a hash-partitioned table at scale:
    * probing is a partition-pruned join, and recall/work is tuned by
    * nProbe — the standard IVF trade.
    */
  def topKIvf(embeddings: DataFrame): DataFrame = {
    val e = withNorm(embeddings)
    val cents = e.filter(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cell"), col("v").as("cv"),
        col("nrm").as("cn"))
    // L2² via dot products; identical op order to the oracle SQL
    def dist2(v: Column, nv: Column, cv: Column, nc: Column): Column =
      nv * nv - lit(2.0) * dot(v, cv) + nc * nc
    val ranked = e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        dist2(col("v"), col("nrm"), col("cv"), col("cn")).as("d2"))
      .withColumn("rn", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("d2"), col("cell"))))
    val assign = ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val probes = ranked.filter(col("rn") <= IvfProbes
        && col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell"))
    val scored = assign.join(broadcast(probes),
        assign("cell") === probes("cell")
          && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), assign("cell"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
          .as("cosine"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cell"),
        col("cosine"))
  }

  def topKIvfSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
       |                   for x in embedding])) AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cell, embedding AS cv, nrm AS cn FROM e
       |  WHERE vec_id < $IvfCells),
       |ranked AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, cents.cell,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      e.nrm * e.nrm
       |        - 2.0 * list_sum([CAST(e.embedding[i] AS DOUBLE)
       |                          * CAST(cv[i] AS DOUBLE)
       |                          for i in range(1, len(e.embedding) + 1)])
       |        + cn * cn,
       |      cents.cell) AS rn
       |  FROM e CROSS JOIN cents),
       |assign AS (
       |  SELECT vec_id, embedding, nrm, cell FROM ranked WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS q_id, embedding AS qv, nrm AS qn, cell
       |  FROM ranked WHERE rn <= $IvfProbes AND vec_id < $NumQueries),
       |scored AS (
       |  SELECT p.q_id, a.vec_id, a.cell,
       |    round(list_sum([CAST(p.qv[i] AS DOUBLE)
       |                    * CAST(a.embedding[i] AS DOUBLE)
       |                    for i in range(1, len(p.qv) + 1)])
       |      / (p.qn * a.nrm), 6) AS cosine
       |  FROM assign a JOIN probes p
       |    ON a.cell = p.cell AND a.vec_id != p.q_id)
       |SELECT q_id, rank, vec_id, cell, cosine FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  def topKLshSql: String = {
    val bucket = (0 until NumPlanes).map { h =>
      val plane = (0 until Dim)
        .map(d => s"${planeInt(h, d)} / 2147483648.0 - 1.0")
        .mkString("[", ", ", "]")
      s"""CASE WHEN list_sum([CAST(embedding[i] AS DOUBLE) * ($plane)[i]
         |      for i in range(1, ${Dim + 1})]) > 0
         |      THEN ${1L << h} ELSE 0 END
         |""".stripMargin.trim
    }.mkString("\n    + ")
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding,
       |    sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
       |                   for x in embedding])) AS nrm,
       |    $bucket AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    round(list_sum([CAST(q.embedding[i] AS DOUBLE)
       |                    * CAST(e.embedding[i] AS DOUBLE)
       |                    for i in range(1, len(q.embedding) + 1)])
       |      / (q.nrm * e.nrm), 6) AS cosine
       |  FROM e q JOIN e ON e.bucket = q.bucket AND e.vec_id != q.vec_id
       |  WHERE q.vec_id < $NumQueries)
       |SELECT q_id, rank, vec_id, cosine, n_candidates FROM (
       |  SELECT *,
       |    count(*) OVER (PARTITION BY q_id) AS n_candidates,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored)
       |WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin
  }
}
