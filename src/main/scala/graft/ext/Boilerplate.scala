package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-template boilerplate detection and removal — the
  * CCNet/RefinedWeb "site template" recipe (public literature: Wenzek
  * et al. 2020, Penedo et al. 2023) re-expressed for a corpus whose
  * unit of repetition is the token n-gram rather than the HTML line:
  * a gram that appears in a large fraction of ONE source's documents is
  * that source's navigation/footer template, not content, and every
  * occurrence of it should be scrubbed before training. This is
  * source-SCOPED frequency (distinct from [[Dedup.dupSpanReport]],
  * which finds spans shared by any two documents corpus-wide): a gram
  * common across many sources is ordinary language; a gram pinned to
  * 40 % of a single domain's pages is template.
  *
  * North-star extension (BASELINE.json); no reference counterpart —
  * the reference pipeline (ingest_transform.py) carries no document
  * corpus.
  *
  * Scale shape: the position stream is one codegen'd map-side
  * projection (posexplode over the token array — no shuffle); document
  * frequency is a map-side-combinable aggregate keyed on
  * (source, 8-byte xxhash64), so the corpus's only shuffles carry
  * (source, long) pairs, never gram text; the template set is the
  * filtered minority and joins back on the same compact key (AQE
  * broadcasts it when small, splits it when a mega-source skews);
  * island-merging is a per-document window bounded by document length.
  * Nothing is corpus-wide single-partition.
  */
object Boilerplate {

  /** Template gram width (tokens). Bigrams: wide enough to carry
    * phrase identity, narrow enough that a planted template is hit by
    * every document that carries it.
    */
  val GramTokens = 2

  /** A gram is template for its source when it appears in at least this
    * fraction (ppm) of the source's documents ...
    */
  val TemplateDfPpm = 200000L

  /** ... and in at least this many distinct documents (guards the ppm
    * test against tiny sources where 1 doc = 50 %).
    */
  val MinTemplateDf = 3L

  /** One row per n-gram occurrence: (doc_id, source, pos, h) with
    * h = xxhash64(gram). Map-side only; empty tokens kept so positions
    * match the oracle's string_split exactly.
    */
  private def positionGrams(documents: DataFrame, n: Int): DataFrame = {
    require(n >= 2, s"template gram width must be >= 2 tokens, got $n")
    // heavy per-row work (gram window explode + xxhash64) — spread an
    // under-partitioned input across cores first (no-op on
    // well-partitioned production inputs; measured 0.38 s single-task
    // at sf0.1 local[32] without it)
    graft.Tables.spreadSmallScan(documents)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("a"))
      .select(col("doc_id"), col("source"), posexplode(
        when(size(col("a")) >= n,
          transform(sequence(lit(0), size(col("a")) - n),
            i => concat_ws(" ", slice(col("a"), i + 1, lit(n)))))
          .otherwise(array().cast("array<string>")))
        .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("source"), col("pos"),
        xxhash64(col("gram")).as("h"))
  }

  /** The shared SQL prefix: per-source document counts + per-(source,
    * gram) document frequency + the template set. The oracle groups by
    * the exact gram string where Spark groups the 8-byte hash — counts
    * agree absent 64-bit collisions (the span-dedup discipline,
    * Dedup.scala:1166).
    */
  private def gramCtesSql(n: Int, dfPpm: Long, minDf: Long): String =
    s"""toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS a
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, source, i - 1 AS pos,
       |    array_to_string(a[i:i+$n-1], ' ') AS gram
       |  FROM toks,
       |    LATERAL unnest(range(1, greatest(len(a) - $n + 2, 1))) AS t(i)),
       |sd AS (
       |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |df AS (
       |  SELECT source, gram, count(DISTINCT doc_id) AS df
       |  FROM grams GROUP BY 1, 2),
       |tmpl AS (
       |  SELECT df.source, df.gram, df.df
       |  FROM df JOIN sd USING (source)
       |  WHERE df.df * 1000000 >= $dfPpm * sd.n_docs
       |    AND df.df >= $minDf)""".stripMargin

  /** Per-(source, h) template grams: grams present in >= `dfPpm` of the
    * source's documents and >= `minDf` documents absolutely.
    */
  def templateGrams(documents: DataFrame, n: Int = GramTokens,
      dfPpm: Long = TemplateDfPpm, minDf: Long = MinTemplateDf)
      : DataFrame = {
    val sourceDocs = documents.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
    positionGrams(documents, n)
      .groupBy("source", "h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .join(sourceDocs, Seq("source"))
      .filter(col("df") * 1000000L >= lit(dfPpm) * col("n_docs")
        && col("df") >= minDf)
      .select(col("source"), col("h"), col("df"))
  }

  /** Per-source template audit: how much of each source's distinct gram
    * vocabulary is template. O(sources) output rows.
    */
  def report(documents: DataFrame, n: Int = GramTokens,
      dfPpm: Long = TemplateDfPpm, minDf: Long = MinTemplateDf)
      : DataFrame = {
    val sourceDocs = documents.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
    positionGrams(documents, n)
      .groupBy("source", "h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .join(sourceDocs, Seq("source"))
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_distinct_grams"),
        count(when(col("df") * 1000000L >= lit(dfPpm) * col("n_docs")
          && col("df") >= minDf, 1)).as("n_template_grams"),
        max(col("df")).as("max_df"))
      .withColumn("template_ppm",
        expr("n_template_grams * 1000000 div n_distinct_grams"))
      .orderBy("source")
  }

  /** DuckDB mirror of [[report]]. */
  def reportSql(n: Int = GramTokens, dfPpm: Long = TemplateDfPpm,
      minDf: Long = MinTemplateDf): String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS a
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, source, i - 1 AS pos,
       |    array_to_string(a[i:i+$n-1], ' ') AS gram
       |  FROM toks,
       |    LATERAL unnest(range(1, greatest(len(a) - $n + 2, 1))) AS t(i)),
       |sd AS (
       |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |df AS (
       |  SELECT source, gram, count(DISTINCT doc_id) AS df
       |  FROM grams GROUP BY 1, 2)
       |SELECT df.source, CAST(max(sd.n_docs) AS BIGINT) AS n_docs,
       |  count(*) AS n_distinct_grams,
       |  count(CASE WHEN df.df * 1000000 >= $dfPpm * sd.n_docs
       |    AND df.df >= $minDf THEN 1 END) AS n_template_grams,
       |  CAST(max(df.df) AS BIGINT) AS max_df,
       |  count(CASE WHEN df.df * 1000000 >= $dfPpm * sd.n_docs
       |    AND df.df >= $minDf THEN 1 END) * 1000000
       |    // count(*) AS template_ppm
       |FROM df JOIN sd USING (source)
       |GROUP BY df.source ORDER BY df.source""".stripMargin

  /** Scrub plan: every occurrence of a template gram (in its own
    * source) marks its n-token interval for removal; per document the
    * intervals merge into maximal islands (gaps-and-islands over a
    * running max-end window, the [[Dedup.dupSpanScrub]] machinery), so
    * overlapping template grams never double-count a token. Returns the
    * exact per-document token accounting of the scrub.
    */
  def scrub(documents: DataFrame, n: Int = GramTokens,
      dfPpm: Long = TemplateDfPpm, minDf: Long = MinTemplateDf)
      : DataFrame = {
    val tmpl = templateGrams(documents, n, dfPpm, minDf)
      .select(col("source"), col("h"))
    val drops = positionGrams(documents, n)
      .join(tmpl, Seq("source", "h"))
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + n - 1).as("e"))
    val wPrev = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val removed = drops
      .withColumn("brk",
        when(col("s") > coalesce(max(col("e")).over(wPrev), lit(-1)), 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy("doc_id", "island")
      .agg((max(col("e")) - min(col("s")) + 1).as("len"))
      .groupBy("doc_id")
      .agg(sum(col("len")).as("tokens_removed"))
    documents
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"))
      .withColumn("tokens_kept", col("n_tokens") - col("tokens_removed"))
      .withColumn("removed_frac",
        when(col("n_tokens") > 0,
          round(col("tokens_removed").cast("double") / col("n_tokens"), 6))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[scrub]]. */
  def scrubSql(n: Int = GramTokens, dfPpm: Long = TemplateDfPpm,
      minDf: Long = MinTemplateDf): String =
    s"""WITH ${gramCtesSql(n, dfPpm, minDf)},
       |drops AS (
       |  SELECT g.doc_id, g.pos AS s, g.pos + $n - 1 AS e
       |  FROM grams g JOIN tmpl t
       |    ON g.source = t.source AND g.gram = t.gram),
       |isl AS (
       |  SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER (
       |      PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |    THEN 1 ELSE 0 END AS brk
       |  FROM drops),
       |isl2 AS (
       |  SELECT doc_id, s, e, sum(brk) OVER (
       |    PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING)
       |    AS island
       |  FROM isl),
       |merged AS (
       |  SELECT doc_id, CAST(sum(len) AS BIGINT) AS tokens_removed
       |  FROM (SELECT doc_id, max(e) - min(s) + 1 AS len
       |        FROM isl2 GROUP BY doc_id, island)
       |  GROUP BY doc_id),
       |nt AS (SELECT doc_id, len(a) AS n_tokens FROM toks)
       |SELECT nt.doc_id, nt.n_tokens,
       |  coalesce(m.tokens_removed, 0) AS tokens_removed,
       |  nt.n_tokens - coalesce(m.tokens_removed, 0) AS tokens_kept,
       |  CASE WHEN nt.n_tokens > 0
       |    THEN round(CAST(coalesce(m.tokens_removed, 0) AS DOUBLE)
       |      / nt.n_tokens, 6)
       |    ELSE 0.0 END AS removed_frac
       |FROM nt LEFT JOIN merged m ON nt.doc_id = m.doc_id
       |ORDER BY nt.doc_id""".stripMargin
}
