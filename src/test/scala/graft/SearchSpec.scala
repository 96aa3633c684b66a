package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Search

/** Postings-index retrieval: conjunctive search equals the brute-force
  * scan, the index read prunes to the query terms' bucket partitions,
  * and TF-IDF ranks by the exact score form both engines compute.
  */
class SearchSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables(spark, Sf0001).documents

  test("hybrid RRF: fused score is the exact integer rank formula") {
    val t = Tables(spark, Sf0001)
    val rows = Search.hybridMoreLikeThis(t.documents, t.embeddings, 7L)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (lex, vec, fp) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lex > 0 || vec > 0) // every fused doc came from a ranker
      def part(rk: Long) =
        if (rk == 0) 0L else Search.RrfScale / (Search.RrfK + rk)
      assert(fp == part(lex) + part(vec))
    }
    // descending fused score with doc_id tie-break
    val key = rows.map(r => (-r.getLong(4), r.getLong(1))).toSeq
    assert(key == key.sorted)
    // a doc present in BOTH pools must outrank one with the same single
    // rank in only one pool: fusion is strictly additive
    val both = rows.filter(r => r.getLong(2) > 0 && r.getLong(3) > 0)
    val single = rows.filter(r => r.getLong(2) == 0 || r.getLong(3) == 0)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getLong(4)).max > single.map(_.getLong(4)).min)
  }

  test("MLT served from the postings index equals the live tokenize path") {
    val path = java.nio.file.Files.createTempDirectory("mltidx").toString
    Search.writeSearchIndex(docs, path)
    val live = Search.moreLikeThis(docs, 7L).collect().toSeq
    val served = Search.moreLikeThisServed(spark, path, 7L)
      .collect().toSeq
    assert(served == live)
  }

  test("conjunctive search over the postings index equals a full scan") {
    val path = java.nio.file.Files.createTempDirectory("postings").toString
    Search.writeSearchIndex(docs, path)
    val terms = Seq("spark", "join", "window")
    val viaIndex = Search.searchAll(spark, path, terms)
      .collect().map(_.getLong(0)).toSet
    val brute = docs.filter(terms
        .map(t => array_contains(split(col("text"), " "), t))
        .reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == brute && viaIndex.nonEmpty)
    // the scan must read ONLY the terms' bucket partitions
    val termBuckets = terms.map(Search.bucketOf(_)).distinct.toSet
    val files = spark.read.parquet(s"$path/postings")
      .filter(col("bucket").isin(termBuckets.toSeq: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    val bucketDirs = files.flatMap(
      "bucket=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toLong)).toSet
    assert(bucketDirs == termBuckets,
      s"scan must prune to $termBuckets, read $bucketDirs")
    val totalBuckets = spark.read.parquet(s"$path/postings")
      .select("bucket").distinct().count()
    assert(bucketDirs.size < totalBuckets)
  }

  test("incremental postings ingest: new docs searchable, replay idempotent") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("postinc").toString
    Search.writeSearchIndex(
      Seq((0L, "spark join"), (1L, "table scan")).toDF("doc_id", "text"),
      path)
    val batch = Seq((2L, "spark join window")).toDF("doc_id", "text")
    Search.appendToSearchIndex(batch, path, 1L)
    def hits = Search.searchAll(spark, path, Seq("spark", "join"))
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(0L, 2L), "appended doc must be searchable")
    val n = spark.read.parquet(s"$path/postings").count()
    Search.appendToSearchIndex(batch, path, 1L) // replay
    assert(spark.read.parquet(s"$path/postings").count() == n)
    assert(hits == Set(0L, 2L))
    // the doc-length component grew with the SAME batch discipline
    assert(spark.read.parquet(s"$path/doclen").count() == 3L)
  }

  test("searchAll rejects empty or duplicate term lists") {
    val path = java.nio.file.Files.createTempDirectory("postings2").toString
    Search.writeSearchIndex(docs.limit(10), path)
    intercept[IllegalArgumentException](
      Search.searchAll(spark, path, Nil))
    intercept[IllegalArgumentException](
      Search.searchAll(spark, path, Seq("a", "a")))
  }

  test("phrase search counts adjacent and overlapping occurrences") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a a a b"),   // "a a" overlaps itself: 2 occurrences
      (1L, "x y x y"),   // adjacent repeats: 2
      (2L, "x y"),       // single: 1
      (3L, "b a"),       // no phrase
      (4L, "y x")        // reversed order is no hit
    ).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("phr").toString
    Search.writeSearchIndex(corpus, path)
    def hits(terms: Seq[String]) =
      Search.searchPhrase(spark, path, terms).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(Seq("a", "a")) == Map(0L -> 2L))
    assert(hits(Seq("x", "y")) == Map(1L -> 2L, 2L -> 1L))
    assert(hits(Seq("a", "a", "a")) == Map(0L -> 1L))
    assert(hits(Seq("b", "a")) == Map(3L -> 1L)) // cross-doc boundaries don't leak
  }

  test("bm25 ranks multi-term hits first and reports terms hit") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "spark window spark"),
      (1L, "spark table"),
      (2L, "window table"),
      (3L, "table value")).toDF("doc_id", "text")
    val got = Search.bm25TopDocs(corpus, Seq("spark", "window"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.head._2 == 0L && got.head._3 == 2L,
      "the doc carrying both terms must rank first")
    assert(got.length == 3) // doc 3 hits nothing
    assert(got.forall { case (_, d, _) => d != 3L })
  }

  test("tf-idf ranks a term-stuffed doc first; idf falls with df") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "spark spark spark join"),
      (1L, "spark join"),
      (2L, "join window"),
      (3L, "window window table")).toDF("doc_id", "text")
    val got = Search.tfIdfTopDocs(corpus, Seq("spark", "window"), topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val spark1 = got.filter(_._1 == "spark")
    assert(spark1.map(x => (x._2, x._3)).toSeq == Seq((1L, 0L), (2L, 1L)),
      "tf 3 beats tf 1 at equal df")
    // df(spark)=2 of 4 docs -> idf ln(2); doc 0 score = 3 ln 2
    assert(math.abs(spark1.head._6 - math.round(
      3 * math.log(2) * 1e6) / 1e6) < 1e-9)
    val window1 = got.filter(_._1 == "window")
    assert(window1.head._3 == 3L, "tf 2 wins for window")
  }

  test("served BM25 equals the in-flight ranking; appends merge tf") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Search.writeSearchIndex(docs, idx)
    val terms = Seq("spark", "join", "window")
    val inflight = Search.bm25TopDocs(docs, terms).collect()
    val served = Search.bm25Served(spark, idx, terms).collect()
    assert(served.sameElements(inflight))
    // an appended batch is scored on the next serve: BOTH components
    // grow in the one appendToSearchIndex call
    // tf 20 per term at dl 60 saturates tf·(k1+1)/(tf+·) near its
    // (k1+1) ceiling with a far-below-average dl — above any fixture doc
    val extra = Seq((900000L,
      Seq.fill(20)("spark join window").mkString(" ")))
      .toDF("doc_id", "text")
    Search.appendToSearchIndex(extra, idx, 1L)
    val after = Search.bm25Served(spark, idx, terms).collect()
    assert(after.head.getLong(1) == 900000L,
      "the term-stuffed appended doc must rank first")
  }

  test("more-like-this ranks by tf-idf cosine over shared tokens only") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "apple banana"),
      (3L, "banana cherry"),
      (4L, "durian elderberry")).toDF("doc_id", "text")
    val got = Search.moreLikeThis(corpus, queryDocId = 1L)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 4 shares nothing -> absent; the query doc itself is excluded
    assert(got.map(_._2).toSeq == Seq(2L, 3L))
    assert(got.map(_._3).toSeq == Seq(2L, 1L)) // shared-term counts
    // hand cosine: idf(apple)=ln 2, idf(banana)=ln(4/3)
    val (ia2, ib2) = (math.pow(math.log(2), 2),
      math.pow(math.log(4.0 / 3), 2))
    val nq = math.sqrt(4 * ia2 + ib2)
    val exp2 = (2 * ia2 + ib2) / (nq * math.sqrt(ia2 + ib2))
    val exp3 = ib2 / (nq * math.sqrt(ib2 + math.pow(math.log(4), 2)))
    assert(math.abs(got(0)._4 - exp2) < 1e-5)
    assert(math.abs(got(1)._4 - exp3) < 1e-5)
    assert(got(0)._1 == 1 && got(1)._1 == 2)
  }
}
