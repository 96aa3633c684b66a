package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Hashing._

/** Text retrieval over the `documents` table — the last classic piece of
  * a corpus engine: a persisted POSTINGS index (token → doc ids) sharded
  * by token-hash bucket, conjunctive (AND) term search that reads only
  * the query terms' buckets, and TF-IDF relevance ranking. Extends the
  * reference per BASELINE.json's north-star alongside [[TextAnalysis]].
  *
  * Scale design mirrors the IVF index ([[Similarity.writeIvfIndex]]):
  * the index is built ONCE (one corpus scan → one narrow shuffle of
  * (token, doc_id) pairs), persisted hive-partitioned by
  * `bucket = h32(token) % NumBuckets`, and a query reads ONLY the
  * partitions its terms hash to — at 100 TB that is k bucket scans per
  * k-term query, never the corpus. Posting-list intersection is a
  * map-side-combinable count over the merged postings: a doc matches a
  * conjunctive query iff it carries all k distinct terms.
  */
object Search {

  /** Token-hash shard count for the postings layout (fixture value;
    * production sizes this to thousands — the trade is partition count
    * vs per-partition file size).
    */
  val NumBuckets = 32

  /** Tokens of one document, distinct per doc (postings record
    * presence; term frequency is kept alongside for TF-IDF).
    */
  private def docTokens(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))

  /** Build + persist the postings index: (token, doc_id, tf) rows
    * partitioned by the token-hash bucket, one file per bucket.
    */
  def writePostingsIndex(documents: DataFrame, path: String,
      buckets: Int = NumBuckets): Unit =
    docTokens(documents)
      .withColumn("bucket", h32(col("token")) % buckets)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(path)

  /** Bucket a term exactly like the index writer (non-negative h32). */
  def bucketOf(term: String, buckets: Int = NumBuckets): Long =
    jvmH32(term) % buckets

  /** Conjunctive search against a persisted postings index: returns the
    * doc_ids carrying ALL `terms`. Reads only the terms' bucket
    * partitions (collected literal partition filter — k values for a
    * k-term query), then one count-combine over the merged postings.
    */
  def searchAll(spark: SparkSession, path: String,
      terms: Seq[String], buckets: Int = NumBuckets): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size,
      "terms must be non-empty and distinct")
    val termBuckets = terms.map(bucketOf(_, buckets)).distinct
    spark.read.parquet(path)
      .filter(col("bucket").isin(termBuckets: _*)) // partition pruning
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit")) // (doc, token) rows are distinct
      .filter(col("n_hit") === terms.size)
      .select(col("doc_id"))
  }

  /** DuckDB twin of [[writePostingsIndex]] + [[searchAll]] composed —
    * the oracle checks the SEMANTICS (docs containing every term), not
    * the storage layout.
    */
  def searchAllSql(terms: Seq[String]): String = {
    val conj = terms
      .map(t => s"list_contains(string_split(text, ' '), '$t')")
      .mkString("\n  AND ")
    s"""SELECT doc_id FROM documents
       |WHERE $conj
       |ORDER BY doc_id""".stripMargin
  }

  /** TF-IDF relevance: for each query term, the `topK` highest-scoring
    * documents. tf = in-doc term count, idf = ln(N/df) over the corpus,
    * score = tf·idf rounded to 6 dp (the cross-engine-stable form; ties
    * break on doc_id). One token scan feeds both tf and df; the df and
    * corpus-size attaches are broadcast O(terms) / 1-row frames.
    */
  def tfIdfTopDocs(documents: DataFrame, terms: Seq[String],
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docTokens(documents).filter(col("token").isin(terms: _*))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = documents.select(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("token")
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("token"), col("rank"), col("doc_id"), col("tf"),
        col("df"), col("score"))
  }

  /** DuckDB mirror of [[tfIdfTopDocs]]. */
  def tfIdfTopDocsSql(terms: Seq[String], topK: Int = 5): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH tf AS (
       |  SELECT doc_id, token, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |    FROM documents)
       |  WHERE token IN ($termList) AND token != ''
       |  GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.token, tf.doc_id, tf.tf, df.df,
       |    round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS score
       |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
       |SELECT token, rank, doc_id, tf, df, score FROM (
       |  SELECT *, row_number() OVER (PARTITION BY token
       |    ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |WHERE rank <= $topK
       |ORDER BY token, rank""".stripMargin
  }
}
