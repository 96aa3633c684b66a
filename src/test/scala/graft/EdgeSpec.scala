package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Similarity, TextAnalysis}

/** Degenerate-input robustness: every ext operator must return an empty
  * (or summary-zero) result on empty input, never throw — at 100 TB,
  * empty partitions and empty date-slices are routine.
  */
class EdgeSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType))))

  private lazy val emptyEmb = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  test("dedup operators are total on empty corpora") {
    assert(Dedup.minhashNearDups(emptyDocs).count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccardNearDups(emptyDocs).count() == 0)
    assert(Dedup.minhashClusters(emptyDocs).count() == 0)
    val ex = Dedup.exactSummary(emptyDocs).head()
    assert(ex.isNullAt(ex.fieldIndex("total_docs"))
      || ex.getAs[Long]("total_docs") == 0)
  }

  test("similarity and text operators are total on empty inputs") {
    assert(Similarity.topKBruteForce(emptyEmb).count() == 0)
    assert(Similarity.topKLsh(emptyEmb).count() == 0)
    assert(Similarity.topKIvf(emptyEmb).count() == 0)
    assert(Dedup.embeddingNearDups(emptyEmb).count() == 0)
    assert(TextAnalysis.textStats(emptyDocs).count() == 0)
    assert(TextAnalysis.fingerprints(emptyDocs).count() == 0)
    assert(TextAnalysis.topTokens(emptyDocs).count() == 0)
    assert(TextAnalysis.langIdConfusion(emptyDocs).count() == 0)
  }

  test("single-doc corpus yields no pairs but sane stats") {
    import spark.implicits._
    val one = Seq((1L, "just one tiny document", "en", "s", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Dedup.minhashNearDups(one).count() == 0)
    assert(Dedup.minhashClusters(one).count() == 0)
    val stats = TextAnalysis.textStats(one).head()
    assert(stats.getAs[Long]("n_tokens") == 4)
  }

  test("round-3 operators are total on empty inputs") {
    import spark.implicits._
    assert(Dedup.embeddingNearDupsAnn(emptyEmb).count() == 0)
    assert(TextAnalysis.lengthQuantilesApprox(emptyDocs).count() == 0)
    assert(graft.schema.SchemaEvolution.schemaDriftReport(
        emptyDocs.select(col("text").as("payload")), col("payload"),
        Seq("id", "email"))
      .collect().map(r => (r.getString(0), r.getString(3))).toSeq
      == Seq(("email", "missing"), ("id", "missing")))
    // avro decode is null-safe (null value -> null struct, no throw)
    graft.functions.GraftFunctions.register(spark)
    val r = Seq[Array[Byte]](null).toDF("value")
      .select(graft.functions.GraftFunctions.avroDecodeCe(col("value")))
      .head()
    assert(r.isNullAt(0))
  }

  test("round-5 operators are total on empty inputs") {
    import spark.implicits._
    import graft.ext.Curation
    assert(Curation.decontaminationReport(emptyDocs).count() == 0)
    assert(Curation.stratifiedSampleSummary(emptyDocs).count() == 0)
    assert(Curation.packPlan(emptyDocs).count() == 0)
    assert(Curation.trainingMix(emptyDocs).count() == 0)
    assert(TextAnalysis.repetitionReport(emptyDocs).count() == 0)
    assert(Dedup.incrementalNearDups(emptyDocs, emptyDocs).count() == 0)
    assert(Dedup.minhashNearDups(emptyDocs, Some(5)).count() == 0)
    // joins: empty probe/left and empty reference/right sides
    val l = Seq(("a", 1L, 2L)).toDF("k", "ts", "x")
    val iv = Seq(("a", 0L, 10L)).toDF("k", "s", "e")
    val noL = l.limit(0); val noIv = iv.limit(0)
    assert(graft.operators.AsOfJoin
      .backward(noL, iv.select(col("k"), col("s").as("ts")),
        Seq("k"), "ts", "ts", Seq("ts")).count() == 0)
    assert(graft.operators.AsOfJoin
      .backward(l, noIv.select(col("k"), col("s").as("ts")),
        Seq("k"), "ts", "ts", Seq("ts")).count() == 1) // left join: row kept
    assert(graft.operators.RangeJoin
      .pointInInterval(noL.select(col("k"), col("ts").as("v")), iv,
        "v", "s", "e", Seq("k"), 10L).count() == 0)
    assert(graft.operators.RangeJoin
      .pointInInterval(l.select(col("k"), col("ts").as("v")), noIv,
        "v", "s", "e", Seq("k"), 10L).count() == 0)
    // an inverted interval (e < s) yields no rows, not an explode error
    val bad = Seq(("a", 10L, 0L)).toDF("k", "s", "e")
    assert(graft.operators.RangeJoin
      .pointInInterval(l.select(col("k"), col("ts").as("v")), bad,
        "v", "s", "e", Seq("k"), 10L).count() == 0)
  }

  test("round-6 operators are total on empty/degenerate inputs") {
    import graft.ext.{Curation, Search}
    // chunking: empty corpus, empty text, invalid params
    assert(Curation.chunkPlan(emptyDocs).count() == 0)
    assert(Curation.chunkedDocuments(emptyDocs).count() == 0)
    intercept[IllegalArgumentException](
      Curation.chunkPlan(emptyDocs, maxTokens = 10L, overlap = 10L))
    // search: empty corpus index is buildable and query-able
    val path = java.nio.file.Files.createTempDirectory("edge6").toString
    Search.writeSearchIndex(emptyDocs, s"$path/p")
    assert(Search.searchAll(spark, s"$path/p", Seq("x")).count() == 0)
    assert(Search.searchPhrase(spark, s"$path/p", Seq("x", "y"))
      .count() == 0)
    assert(Search.tfIdfTopDocs(emptyDocs, Seq("x")).count() == 0)
    assert(Search.bm25TopDocs(emptyDocs, Seq("x")).count() == 0)
    assert(TextAnalysis.lmScore(emptyDocs).count() == 0)
    // hierarchical IVF + adaptive routing on an empty corpus
    assert(Similarity.topKIvfHier(emptyEmb).count() == 0)
    assert(Similarity.topKIvfAdaptive(emptyEmb, 300).count() == 0)
    // pack sharding: null lang degrades to a null stream key, no throw
    import spark.implicits._
    val nullLang = Seq((0L, "a b", null.asInstanceOf[String], "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Curation.packPlan(nullLang,
      streamCol = Curation.packStreamSharded()).count() == 1)
    // span dedup: empty corpus, invalid n
    import graft.ext.Dedup
    assert(Dedup.dupSpanReport(emptyDocs).count() == 0)
    assert(Dedup.dupSpanTop(emptyDocs).count() == 0)
    assert(Dedup.dupSpanScrub(emptyDocs).count() == 0)
    intercept[IllegalArgumentException](Dedup.dupSpanReport(emptyDocs, 1))
    // more-like-this: empty corpus / absent query doc -> empty, no throw
    assert(Search.moreLikeThis(emptyDocs, 0L).count() == 0)
    val one = Seq((7L, "a b c")).toDF("doc_id", "text")
    assert(Search.moreLikeThis(one, 99L).count() == 0)
  }

  test("round-10 operators are total on empty inputs") {
    assert(graft.ext.Curation.paddingReport(emptyDocs).count() == 0)
    assert(graft.ext.EmbedStats.labelBalance(emptyEmb).count() == 0)
    assert(graft.ext.Dedup.dedupManifest(emptyDocs).count() == 0)
    assert(graft.ext.Bpe.fertilityReport(emptyDocs,
      Seq(graft.ext.Bpe.Merge(1, "a", "b", "ab", 0L))).count() == 0)
  }

  test("round-11 operators are total on empty inputs") {
    assert(graft.ext.Dedup.dedupManifestFlat(emptyDocs).count() == 0)
    assert(graft.ext.Dedup.dedupManifestBest(emptyDocs).count() == 0)
    assert(graft.ext.EmbedStats.hashEmbeddingsLong(emptyDocs).count() == 0)
    assert(TextAnalysis.zipfFit(emptyDocs).count() == 0)
    assert(graft.ext.Multimodal.imageNearDups(emptyDocs).count() == 0)
    assert(graft.ext.Multimodal.audioNearDups(emptyDocs).count() == 0)
    assert(graft.ext.Multimodal.videoNearDups(emptyDocs).count() == 0)
    assert(graft.ext.Multimodal.mediaDedupClusters(emptyDocs).count() == 0)
    // empty release: zero groups -> zero report rows (no NULL levels)
    assert(graft.ext.Privacy.kAnonymityReport(
      emptyDocs, Seq(col("source"))).count() == 0)
    assert(graft.ext.Privacy.lDiversityReport(
      emptyDocs, Seq(col("source")), col("lang")).count() == 0)
    assert(graft.ext.Takedown.takedownAudit(emptyDocs).count() == 0)
    val noIds = emptyDocs.select(col("doc_id"))
    assert(graft.ext.Takedown.purged(emptyDocs, noIds, "doc_id")
      .count() == 0)
    // purging a nonexistent index path is a zero-stat no-op, not a crash
    assert(graft.ext.Takedown.purgeIndex(spark,
      "/tmp/graft_no_such_index", "doc_id", noIds, Seq("batch_id"))
      == graft.ext.Takedown.PurgeStats(0L, 0L, 0L, 0L))
  }

  test("round-12 operators are total on empty/degenerate inputs") {
    import spark.implicits._
    // an empty corpus still builds a valid (data-less) fp index, and
    // every served screen over it answers 0, not a crash
    val path = java.nio.file.Files
      .createTempDirectory("mediafp_empty").toString
    graft.ext.Multimodal.writeMediaFpIndex(emptyDocs, path)
    for (m <- graft.ext.Multimodal.MediaFpModalities)
      assert(graft.ext.Multimodal.mediaNearDupsServed(spark, path, m)
        .count() == 0)
    assert(graft.ext.Multimodal.mediaDedupClustersServed(spark, path)
      .count() == 0)
    // corpus clusters: empty pair streams on either side
    val noPairs = Seq.empty[(Long, Long, String)]
      .toDF("doc_a", "doc_b", "modality")
    val noText = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.ext.Multimodal
      .corpusDedupClustersFromPairs(noPairs, noText).count() == 0)
    assert(graft.ext.Multimodal
      .corpusDedupClusters(emptyDocs, noText).count() == 0)
    // HLL aggregate takedown: empty id set and empty events are no-ops
    val emptyEvents = Seq.empty[(java.sql.Timestamp, Long, String)]
      .toDF("ts", "user_id", "event_type")
    val hllPath = java.nio.file.Files
      .createTempDirectory("hll_empty").toString
    graft.ext.SketchIndex.writeHllIndex(
      Seq((new java.sql.Timestamp(86400000L), 1L, "view"))
        .toDF("ts", "user_id", "event_type"), hllPath)
    val noUsers = Seq.empty[Long].toDF("user_id")
    assert(graft.ext.Takedown.hllStaleDays(spark, hllPath,
      emptyEvents, noUsers).count() == 0)
    val st = graft.ext.Takedown.purgeHllIndex(spark, hllPath,
      emptyEvents, noUsers)
    assert(st.affectedDays == 0L && st.staleAfter == 0L)
    // index lifecycle: resolve/retained-roots on a path with no
    // versions fall back to the flat layout; nextVersion starts at 1
    assert(graft.ext.Versioned.resolve(spark, hllPath) == hllPath)
    assert(graft.ext.Versioned.nextVersion(spark, hllPath) == 1L)
    assert(graft.ext.Versioned.resolve(spark,
      "/tmp/graft_no_such_versioned") == "/tmp/graft_no_such_versioned")
  }

  test("round-5b operators degrade gracefully on degenerate inputs") {
    import spark.implicits._
    import graft.ext.{Bpe, Curation, ProductQuant}
    // empty corpus: report rows exist with zero counts; gates/BPE empty
    assert(TextAnalysis.qualityFilter(emptyDocs).count() == 0)
    val rep = TextAnalysis.qualityFilterReport(emptyDocs).collect()
    assert(rep.length == TextAnalysis.FilterRules.size
      && rep.forall(_.getAs[Long]("n_failed") == 0L)
      && rep.forall(_.getAs[Long]("n_docs") == 0L))
    assert(Bpe.trainMerges(emptyDocs).isEmpty)
    assert(Curation.normalizedReport(emptyDocs).count() == 0)
    // single-char words: no adjacent pairs -> trainer stops with no merges
    val singles = Seq((1L, "a b c"), (2L, "b c a"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    assert(Bpe.trainMerges(singles).isEmpty)
    // null text flows through normalization/scrub as null, never throws
    val withNull = Seq((1L, null: String), (2L, "ok text here"))
      .toDF("doc_id", "text")
    val norm = withNull
      .select(Curation.normalizeText(col("text")).as("n"),
        Curation.scrubPii(col("text")).as("s"))
      .orderBy(lit(1)).collect()
    assert(norm.exists(r => r.isNullAt(0) && r.isNullAt(1)))
    // PQ on a corpus smaller than K trains a dense |corpus|-cell book
    val tiny = Seq(
      (0L, Array.fill(64)(0.1f), 0), (1L, Array.fill(64)(0.9f), 0),
      (2L, Array.fill(64)(-0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val cbs = ProductQuant.trainCodebooks(tiny)
    assert(cbs.forall(_.size == 3))
    val codes = tiny.select(ProductQuant.encodeExpr(
        col("embedding").cast("array<double>"), cbs).as("c"))
      .select(explode(col("c"))).collect().map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c < 3))
    // z-order on a constant column: span-0 guard, single bucket, no NaN
    val const = spark.range(100).select(lit(7L).as("x"), col("id").as("y"))
    val dir = java.nio.file.Files.createTempDirectory("zconst").toString
    graft.ops.Layout.writeZOrdered(const, dir, Seq("x", "y"), 4)
    assert(spark.read.parquet(dir).count() == 100)
  }
}
