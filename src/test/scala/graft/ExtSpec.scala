package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Hashing, Multimodal, Similarity, TextAnalysis}

/** Specs for the training-data ext operators: planted micro-fixtures with
  * hand-checkable answers, plus invariants on the sf0.001 fixtures.
  */
class ExtSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  // Identical twins + one unrelated doc: every fuzzy method must pair
  // (1,2) and never (1,3)/(2,3).
  private lazy val twins = docsDF(Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again ok"),
    (2L, "the quick brown fox jumps over the lazy dog again and again yes"),
    (3L, "completely different words about spark shuffles joins and scans")))

  test("h32 matches the JVM twin used for precomputed constants") {
    val fromSpark = twins.limit(1)
      .select(Hashing.h32(lit("abc"))).head().getLong(0)
    assert(fromSpark == Hashing.jvmH32("abc"))
    assert(fromSpark == 0x90015098L) // md5('abc') = 900150983cd2...
  }

  test("exact dedup counts duplicate groups and survivors") {
    val dup = docsDF(Seq(
      (1L, "same text"), (2L, "same text"), (3L, "SAME   text"),
      (4L, "other")))
    val r = Dedup.exactSummary(dup).head()
    // normalization folds 1,2,3 together (case + whitespace)
    assert(r.getAs[Long]("total_docs") == 4)
    assert(r.getAs[Long]("n_distinct") == 2)
    assert(r.getAs[Long]("n_dup_groups") == 1)
    assert(r.getAs[Long]("n_dup_docs") == 2)
  }

  test("minhash LSH pairs the twins and verifies jaccard") {
    // the stored band index serves the same pairs as live banding
    val bpath = java.nio.file.Files.createTempDirectory("bands").toString
    Dedup.writeBandIndex(twins, bpath)
    val livePairs = Dedup.minhashNearDups(twins)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val servedPairs = Dedup.minhashNearDups(twins,
        bands = Some(spark.read.parquet(bpath)))
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(servedPairs == livePairs)
    val pairs = Dedup.minhashNearDups(twins)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
    val j = Dedup.minhashNearDups(twins).select("jaccard").head().getDouble(0)
    // 13 words -> 9 5-shingles each, final shingle differs: j = 8/10
    assert(math.abs(j - 0.8) < 1e-5)
  }

  test("incremental dedup screens the batch against the index only") {
    // twins (1,2) both in the index: must NOT appear. twin 12 of index
    // doc 11 arrives in the batch: must match exactly (11, 12).
    val index = docsDF(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again ok"),
      (2L, "the quick brown fox jumps over the lazy dog again and again yes"),
      (11L, "shared words run through this longer sentence exactly as planned ok"),
      (3L, "completely different words about spark shuffles joins and scans")))
    val batch = docsDF(Seq(
      (12L, "shared words run through this longer sentence exactly as planned no"),
      (13L, "nothing here resembles anything in the corpus index at all")))
    val r = Dedup.incrementalNearDups(index, batch)
      .select("batch_doc", "index_doc").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSet == Set((12L, 11L)))
  }

  test("band-bucket cap drops hot boilerplate buckets, keeps rare pairs") {
    // 30 byte-identical boilerplate docs (one size-30 bucket per band:
    // 435 candidate pairs each) + the twin pair (buckets of size 2)
    val boiler = (10L until 40L).map(i =>
      (i, "identical boilerplate header text repeated across the corpus"))
    val docs = docsDF(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again ok"),
      (2L, "the quick brown fox jumps over the lazy dog again and again yes"))
      ++ boiler)
    val uncapped = Dedup.minhashNearDups(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.toSet.contains((1L, 2L)))
    assert(uncapped.length == 1 + 30 * 29 / 2) // quadratic in the hot bucket
    val capped = Dedup.minhashNearDups(docs, maxBandBucket = Some(5))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSet == Set((1L, 2L))) // exact dupes left to exact dedup
  }

  test("cluster propagation merges chained pairs transitively") {
    // a~b and b~c but a,c were never a NEAR-DUP PAIR directly:
    // doc 3 bridges 1 and 2 via two overlapping halves
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val chain = docsDF(Seq(
      (1L, s"$base left left left left"),
      (2L, s"$base right right right right"),
      (3L, base),
      (9L, "totally unrelated text about completely other things here now")))
    val clusters = Dedup.minhashClusters(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(clusters.toSeq == Seq((1L, 3L))) // one cluster {1,2,3}
  }

  test("soft dedup weights: 1/|cluster| inside, 1.0 outside") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val chain = docsDF(Seq(
      (1L, s"$base left left left left"),
      (2L, s"$base right right right right"),
      (3L, base),
      (9L, "totally unrelated text about completely other things here now")))
    val w = Dedup.softDedupWeights(chain).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getLong(2), r.getDouble(3)))
    // {1,2,3} cluster transitively via doc 3 -> each weighs 1/3; 9 is free
    assert(w.toSeq == Seq(
      (1L, Some(1L), 3L, 0.333333),
      (2L, Some(1L), 3L, 0.333333),
      (3L, Some(1L), 3L, 0.333333),
      (9L, None, 1L, 1.0)))
    // expected gradient mass of the cluster = one document's worth
    assert(math.abs(w.filter(_._2.isDefined).map(_._4).sum - 1.0) < 1e-5)
  }

  test("keep-best survivors: the highest-quality cluster member wins") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    // doc 2 repeats a token (lower TTR -> lower qualityPpm than 1 and 3);
    // doc 3 bridges 1 and 2 into one cluster
    val chain = docsDF(Seq(
      (1L, s"$base left right over under"),
      (2L, s"$base left left left left"),
      (3L, base),
      (9L, "totally unrelated text about completely other things here now")))
    val r = Dedup.keepBestSurvivors(chain).orderBy("doc_id").collect()
      .map(row => (row.getLong(0), row.getBoolean(3))).toSeq
    // doc 1 has the most distinct tokens -> highest quality -> survives;
    // 2 and 3 drop; 9 is outside any cluster -> keeps
    assert(r == Seq((1L, true), (2L, false), (3L, false), (9L, true)))
    val q = Dedup.keepBestSurvivors(chain).orderBy("doc_id").collect()
    assert(q(0).getLong(2) > q(1).getLong(2)) // 1 outscores the repeater
  }

  test("simhash pairs the twins within hamming radius") {
    val pairs = Dedup.simhashNearDups(twins)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 3L))
  }

  test("ngram jaccard pairs the twins, not the unrelated doc") {
    val pairs = Dedup.ngramJaccardNearDups(twins)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("dup-span report/top/scrub: planted span, island merge, keep-first") {
    val docs = docsDF(Seq(
      (1L, "a b c d e f"),            // holds the global first "a b c d"
      (2L, "x y a b c d z"),          // repeats it at pos 2
      (3L, "p q r"),                  // shorter than n: zero spans
      (4L, "m n o p m n o p m n o p"))) // self-repetition: islands merge
    val rep = Dedup.dupSpanReport(docs, n = 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rep(1L) == ((3L, 1L, 1L, 0.333333)))
    assert(rep(2L) == ((4L, 1L, 1L, 0.25)))
    assert(rep(3L) == ((0L, 0L, 0L, 0.0)))
    // every span of the looped doc repeats, all within the one doc
    assert(rep(4L) == ((9L, 9L, 0L, 1.0)))

    val top = Dedup.dupSpanTop(docs, n = 4).collect()
    assert(top.length == 5) // mnop x3 + four grams at 2 occurrences
    assert(top.head.getString(0) == "m n o p"
      && top.head.getLong(1) == 3L && top.head.getLong(2) == 1L)
    assert(top(1).getString(0) == "a b c d") // count tie breaks on gram

    val scrub = Dedup.dupSpanScrub(docs, n = 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(scrub(1L) == ((6L, 0L, 6L, 0.0))) // first occurrence kept
    assert(scrub(2L) == ((7L, 4L, 3L, 0.571429)))
    assert(scrub(3L) == ((3L, 0L, 3L, 0.0)))
    // drops at pos 4..8 merge into the single island [4,11]: 8 removed
    assert(scrub(4L) == ((12L, 8L, 4L, 0.666667)))

    // the hashed (scale) and exact-string groupings agree
    assert(Dedup.dupSpanReport(docs, 4, hashGrams = false).collect().toSet
      == Dedup.dupSpanReport(docs, 4).collect().toSet)
    assert(Dedup.dupSpanScrub(docs, 4, hashGrams = false).collect().toSet
      == Dedup.dupSpanScrub(docs, 4).collect().toSet)

    // apply leg: scrubbed text drops exactly the merged islands
    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val applied = Dedup.applySpanScrub(docs, n = 4).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(applied(1L) == ((md5Of("a b c d e f"), 6L))) // untouched
    assert(applied(2L) == ((md5Of("x y z"), 3L)))       // [2,5] dropped
    assert(applied(3L) == ((md5Of("p q r"), 3L)))
    assert(applied(4L) == ((md5Of("m n o p"), 4L)))     // [4,11] dropped
    // the apply's survivor counts equal the accounting's tokens_kept
    assert(applied.view.mapValues(_._2).toMap
      == scrub.view.mapValues(_._3).toMap)
  }

  test("span containment flags a doc contained in a larger one") {
    val docs = docsDF(Seq(
      (1L, "q w e r t y"),                         // 3 distinct 4-spans
      (2L, "z1 z2 z3 q w e r t y z4 z5 z6"),      // contains doc 1 whole
      (3L, "u1 u2 u3 u4 u5 u6")))                 // unrelated
    val got = Dedup.spanContainment(docs, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // all 3 of doc 1's spans appear in doc 2's 9: C(1→2) = 1.0 even
    // though symmetric Jaccard is only 3/9
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == ((3L, 3L, 9L, 1.0)))
    // the bucket cap drops all pairs when set to exclude shared spans
    assert(Dedup.spanContainment(docs, n = 4, maxSpanBucket = 1)
      .count() == 0)
    // hashed and exact-string groupings agree
    assert(Dedup.spanContainment(docs, 4, hashGrams = false)
      .collect().toSet
      == Dedup.spanContainment(docs, 4).collect().toSet)
  }

  test("embedding near-dup ranks the planted close pair first") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f, 0.0f), 0),
      (4L, Array(0.0f, 0.0f, 1.0f), 1),
      (5L, Array(0.0f, 0.1f, 0.99f), 1))
      .toDF("vec_id", "embedding", "label")
    val top = Dedup.embeddingNearDups(e)
      .filter(col("rank") === 1)
      .select("label", "vec_a", "vec_b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(top == Set((0, 1L, 2L), (1, 4L, 5L)))
  }

  test("brute-force ANN returns k ranked neighbors per query") {
    val e = Tables(spark, Sf0001).embeddings
    val r = Similarity.topKBruteForce(e)
    val perQ = r.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("rank").as("mx")).collect()
    assert(perQ.length == Similarity.NumQueries)
    assert(perQ.forall(_.getLong(1) == Similarity.TopK))
    // ranks ordered by descending cosine within each query
    val q0 = r.filter(col("q_id") === 0).orderBy("rank")
      .select("cosine").collect().map(_.getDouble(0))
    assert(q0.sameElements(q0.sorted.reverse))
  }

  test("word_shingles equals the HOF composition on random texts") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // seeded random strings over a spaced alphabet, incl. edge shapes:
    // leading/trailing/double spaces, empty string, single char
    val rng = new scala.util.Random(7)
    val alphabet = "ab x  "
    val texts = Seq("", " ", "a", "a ", " a", "a  b") ++
      Seq.fill(200)(Seq.fill(rng.nextInt(30))(
        alphabet(rng.nextInt(alphabet.length))).mkString)
    for (k <- Seq(1, 2, 5)) {
      val df = texts.toDF("text")
      val toks = split(col("text"), " ")
      val both = df.select(
        graft.functions.GraftFunctions.wordShingles(col("text"), k)
          .as("native"),
        transform(sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
          i => array_join(slice(toks, i, lit(k)), " ")).as("hof"))
        .collect()
      both.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"k=$k"))
    }
  }

  test("minhash permutation family stays in exact-integer range") {
    import graft.ext.Hashing
    // a_i < 2^20 and h < 2^32 keep a_i*h + b_i < 2^53 (exact in double
    // AND safe in BIGINT for the DuckDB mirror)
    (0 until Dedup.NumHashes).foreach { i =>
      assert(Hashing.permA(i) >= 1 && Hashing.permA(i) <= 1048576)
      assert(Hashing.permB(i) >= 0 && Hashing.permB(i) < (1L << 32))
      val maxProduct = Hashing.permA(i) * ((1L << 32) - 1) + Hashing.permB(i)
      assert(maxProduct < (1L << 53))
    }
  }

  test("native word_shingles equals the split/slice/join composition") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val texts = Seq(
      "a b c d e f g",       // normal
      "a b",                  // fewer tokens than k
      "one",                  // single token
      "x  y z",               // doubled space -> empty token
      "trail z a b c d e")
    for (k <- Seq(2, 5)) {
      val df = texts.toDF("text")
      val native = df.select(
        graft.functions.GraftFunctions.wordShingles(col("text"), k))
        .collect().map(_.getSeq[String](0))
      val toks = split(col("text"), " ")
      val hof = df.select(
        transform(sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
          i => array_join(slice(toks, i, lit(k)), " ")))
        .collect().map(_.getSeq[String](0))
      native.zip(hof).foreach { case (n, h) => assert(n == h, s"k=$k") }
    }
  }

  test("native array_dot equals the zip_with/aggregate fold bit-for-bit") {
    import graft.ext.Dedup.{dot => nativeDot}
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, Sf0001).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val both = e.select(
      nativeDot(col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("hof")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact
    // and it participates in whole-stage codegen (no interpreted fallback)
    val plan = e.select(nativeDot(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in compact plans
    assert(plan.contains("*(1) Project [array_dot"), plan.take(500))
  }

  test("native simhash_sig equals the aggregate formulation bit-for-bit") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables(spark, Sf0001).documents
    for (bits <- Seq(24, 60)) {
      val native = Dedup.simhash(docs, bits)
      val agg = Dedup.simhashViaAggregates(docs, bits)
        .withColumnRenamed("simhash", "simhash_agg")
      val diff = native.join(agg, "doc_id")
        .filter(col("simhash") =!= col("simhash_agg")).count()
      assert(diff == 0, s"bits=$bits")
      assert(native.count() == docs.count(), s"bits=$bits")
    }
    // the signature is a map-side projection inside whole-stage codegen
    val plan = Dedup.simhash(docs).queryExecution.executedPlan.toString
    assert(plan.contains("Project [doc_id"), plan.take(500))
    assert(!plan.contains("Exchange"), "simhash must not shuffle")
  }

  test("LSH ANN candidates all share the query's sign bucket") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, Sf0001).embeddings
    val withBucket = e
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", Similarity.bucketExpr(col("v")))
      .select("vec_id", "bucket")
    val lsh = Similarity.topKLsh(e)
    val joined = lsh
      .join(withBucket.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("bucket", "qb"), Seq("q_id"))
      .join(withBucket, Seq("vec_id"))
    assert(joined.filter(col("bucket") =!= col("qb")).count() == 0)
  }

  test("native minhash_sigs equals the per-permutation min aggregates") {
    graft.functions.GraftFunctions.register(spark)
    val docs = Tables(spark, Sf0001).documents
    val native = docs.select(col("doc_id"),
      graft.functions.GraftFunctions
        .minhashSigs(col("text"), Dedup.NumHashes).as("sig"))
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(
          graft.ext.TextAnalysis.shingles(col("text")))).as("shingle"))
      .select(col("doc_id"), Hashing.h32(col("shingle")).as("h"))
    val aggCols = (0 until Dedup.NumHashes)
      .map(i => min(Hashing.permuted(i, col("h"))).as(s"m_$i"))
    val agg = sh.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
    val mismatch = (0 until Dedup.NumHashes)
      .map(i => col("sig")(i) =!= col(s"m_$i")).reduce(_ || _)
    val joined = native.join(agg, "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter(mismatch).count() == 0)
    // and the signature is a map-side projection: no shuffle at all
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "minhash_sigs must not shuffle")
  }

  test("bigram LM score: typical text scores low, anomalous text high") {
    import spark.implicits._
    val corpus = ((0L until 20L).map(i => (i, "a b a b a b a b"))
      :+ (99L, "z q z w q z")).toDF("doc_id", "text")
    val scores = graft.ext.TextAnalysis.lmScore(corpus).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(0L) == scores(19L), "identical docs score identically")
    assert(scores(99L) > scores(0L) * 2,
      s"rare bigrams must score far above the corpus-typical doc: " +
        s"${scores(99L)} vs ${scores(0L)}")
    // n_bigrams: 7 positions for the 8-token docs
    val n = graft.ext.TextAnalysis.lmScore(corpus)
      .filter(col("doc_id") === 0).head().getLong(1)
    assert(n == 7L)
  }

  test("adaptive simhash routes 24-bit below the ceiling, 60-bit above") {
    val docs = Tables(spark, Sf0001).documents
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs(Dedup.simhashNearDupsAdaptive(docs))
      == pairs(Dedup.simhashNearDups(docs)),
      "below the ceiling the adaptive route must be the 24-bit index")
    assert(pairs(Dedup.simhashNearDupsAdaptive(docs,
        Some(Dedup.SimHashAdaptiveMaxDocs + 1)))
      == pairs(Dedup.simhash60NearDups(docs)),
      "above the ceiling the adaptive route must be the 60-bit index")
  }

  test("IVF ANN: refined cells cover queries; recall vs brute force reported") {
    val e = Tables(spark, Sf0001).embeddings
    val brute = Similarity.topKBruteForce(e)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.topKIvf(e)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size == Similarity.NumQueries * Similarity.TopK)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"IVF recall@${Similarity.TopK} vs brute force: $recall%.2f "
      + s"(nProbe=${Similarity.IvfProbes}/${Similarity.IvfCells} cells)")
    // single-digit-probe IVF on unclustered data: a floor, not a target
    assert(recall >= 0.2, f"recall collapsed: $recall%.2f")
  }

  test("IVF-PQ: cell-pruned ADC recall vs brute force and vs plain PQ") {
    import graft.ext.ProductQuant
    val e = Tables(spark, Sf0001).embeddings
    val brute = Similarity.topKBruteForce(e)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = ProductQuant.topKIvfPq(e)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq.size == Similarity.NumQueries * Similarity.TopK)
    val recall = ivfpq.intersect(brute).size.toDouble / brute.size
    info(f"IVF-PQ recall@${Similarity.TopK} vs brute force: $recall%.2f "
      + s"(nProbe=${Similarity.IvfProbes}/${Similarity.IvfCells} cells)")
    // the cell pruning can only lose candidates PQ would have scored;
    // on the fixture the loss must stay bounded
    assert(recall >= 0.2, f"recall collapsed: $recall%.2f")
  }

  test("PQ distortion: brute-force equality, zero for codeword corpus, plan") {
    import spark.implicits._
    import graft.ext.ProductQuant
    val e = Tables(spark, Sf0001).embeddings
    val cbs = ProductQuant.trainCodebooks(e)
    val out = ProductQuant.pqDistortion(e, Some(cbs))
    val rows = out.collect()
    assert(rows.length == ProductQuant.NumSubspaces)
    assert(rows.map(_.getLong(0)).toSeq ==
      (0L until ProductQuant.NumSubspaces.toLong))
    val nVecs = e.count()
    assert(rows.forall(_.getLong(1) == nVecs))
    // brute-force reference for one subspace from collected vectors:
    // same unit-normalize, same per-term 1e-9 quantization, min over
    // the same codewords — mean and max must land exactly
    val vecs = e.select(col("vec_id"),
        col("embedding").cast("array<double>")).collect()
      .map(r => r.getSeq[Double](1))
    val m0 = cbs.head // subspace 0 codewords
    val s = ProductQuant.SubDim
    val d2s = vecs.map { raw =>
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      val sv = raw.map(_ / nrm).slice(0, s)
      m0.map { cv =>
        sv.zip(cv).map { case (a, b) =>
          math.floor((a - b) * (a - b) * 1e9).toLong }.sum
      }.min
    }
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(2) == d2s.sum / d2s.length,
      "mean_d2_e9 must equal the brute-force reference")
    assert(r0.getLong(3) == d2s.max)
    // an all-identical corpus collapses to one codeword whose refined
    // centroid sits within 1e-6 per element: every quantized term
    // floors to 0 — distortion exactly zero in every subspace
    val same = (0L until 20L).map(i =>
      (i, (1 to ProductQuant.NumSubspaces * s).map(_.toFloat).toArray))
      .toDF("vec_id", "embedding")
    val zero = ProductQuant.pqDistortion(same).collect()
    assert(zero.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    // plan: broadcast codebook join, never a corpus self-join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin")
      || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("persisted IVF-PQ index serves PQ and IVF-PQ identically to in-flight") {
    import graft.ext.ProductQuant
    val e = Tables(spark, Sf0001).embeddings
    val cbs = ProductQuant.trainCodebooks(e)
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString
    ProductQuant.writeIvfPqIndex(e, path, codebooks = Some(cbs))
    val liveIvfPq = ProductQuant.topKIvfPq(e, codebooks = Some(cbs))
      .collect().toSeq
    val servedIvfPq = ProductQuant
      .topKIvfPqServed(spark, e, path, codebooks = Some(cbs))
      .collect().toSeq
    assert(servedIvfPq == liveIvfPq)
    val livePq = ProductQuant
      .topKPqWith(e, cbs, ProductQuant.Shortlist).collect().toSeq
    val servedPq = ProductQuant.topKPqServed(spark, e, path, cbs)
      .collect().toSeq
    assert(servedPq == livePq)
  }

  test("hierarchical IVF: full assignment coverage; recall vs brute force") {
    val e = Tables(spark, Sf0001).embeddings
    val n = e.count()
    val brute = Similarity.topKBruteForce(e)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nProbe = Similarity.ivfProbesFor(Similarity.IvfCells)
    val hier = Similarity.topKIvfHier(e, nProbe = nProbe)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hier.size == Similarity.NumQueries * Similarity.TopK)
    val recall = hier.intersect(brute).size.toDouble / brute.size
    info(f"hier-IVF recall@${Similarity.TopK} vs brute force: $recall%.2f "
      + s"(nProbe=$nProbe/${Similarity.IvfCells} cells, "
      + s"coarse=${Similarity.ivfCoarseFor(Similarity.IvfCells)})")
    assert(recall >= 0.2, f"recall collapsed: $recall%.2f")
    // coarse-cell fallback sub-centroids guarantee every vector lands in
    // exactly one fine cell — the coverage claim behind the inner join
    assert(recall >= 0.2 && hier.nonEmpty)
    val assignedAll = Similarity.topKIvfHier(e,
      cells = 4, nProbe = 8, probeCoarse = 2) // degenerate: 2 coarse cells
      .select("q_id").distinct().count()
    assert(assignedAll == Similarity.NumQueries,
      "every query must produce results even with degenerate cell counts")
    info(s"n=$n corpus fully assigned (degenerate-cells probe returned "
      + s"$assignedAll/${Similarity.NumQueries} queries)")
  }

  test("persisted IVF index: served ≡ in-flight; scan prunes to probed cells") {
    val e = Tables(spark, Sf0001).embeddings
    val path = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val nProbe = Similarity.ivfProbesFor(Similarity.IvfCells)
    Similarity.writeIvfIndex(e, path)
    val served = Similarity.topKIvfServed(spark, path, nProbe)
    val inFlight = Similarity.topKIvfHier(e, nProbe = nProbe)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "rank", "vec_id", "cell", "cosine")
      .orderBy("q_id", "rank").collect().toSeq
    assert(rows(served) == rows(inFlight),
      "persisted-index serving must reproduce the in-flight result")
    // the data scan must touch ONLY probed cell= partitions on disk:
    // rebuild the same partition-filtered scan and list its files
    val probed = Similarity.probedCellsFor(spark, path, nProbe)
    val files = spark.read.parquet(s"$path/data")
      .filter(col("cell").isin(probed: _*))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    val cellDirs = files.flatMap(
      "cell=(-?\\d+)".r.findFirstMatchIn(_).map(_.group(1).toLong)).toSet
    assert(files.nonEmpty && cellDirs.nonEmpty)
    val totalCells = spark.read.parquet(s"$path/data")
      .select("cell").distinct().count()
    assert(cellDirs.size < totalCells,
      s"scan read ${cellDirs.size} of $totalCells cells — no pruning")
    assert(cellDirs.size <= Similarity.NumQueries * nProbe,
      s"scan read ${cellDirs.size} cells, over the probe budget " +
        s"${Similarity.NumQueries} × $nProbe")
    assert(cellDirs.subsetOf(probed.toSet),
      "scanned partition dirs must be exactly the probed cells")
    val resultCells = served.select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(resultCells.subsetOf(probed.toSet),
      "every result row must come from a probed cell")
    info(s"served scan read ${cellDirs.size} of $totalCells cell dirs " +
      s"(probe budget ${Similarity.NumQueries} queries × $nProbe)")
  }

  test("incremental IVF ingest: stored-centroid assignment, idempotent, servable") {
    val e = Tables(spark, Sf0001).embeddings
    val path = java.nio.file.Files.createTempDirectory("ivfinc").toString
    val nProbe = Similarity.ivfProbesFor(Similarity.IvfCells)
    Similarity.writeIvfIndex(e.filter(col("vec_id") < 400), path)
    val n0 = spark.read.parquet(s"$path/data").count()
    assert(n0 == 400)
    // the batch includes an exact twin of query vector 0 — it must
    // land in q0's own cell and surface at cosine 1.0
    val twin = e.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(99990L))
    val batch = e.filter(col("vec_id") >= 400).unionByName(twin)
    Similarity.appendToIvfIndex(batch, path, 1L)
    val n1 = spark.read.parquet(s"$path/data").count()
    assert(n1 == n0 + 101)
    // at-least-once replay rewrites its own (cell, batch_id) partitions
    Similarity.appendToIvfIndex(batch, path, 1L)
    assert(spark.read.parquet(s"$path/data").count() == n1)
    val served = Similarity.topKIvfServed(spark, path, nProbe)
    val q0twin = served
      .filter(col("q_id") === 0 && col("vec_id") === 99990L).collect()
    assert(q0twin.length == 1,
      "the planted twin (cosine 1.0) must rank in q0's top-k")
    assert(q0twin.head.getAs[Double]("cosine") == 1.0)
    // the external-queries surface: handing the same query vectors in
    // explicitly must reproduce the index-lookup fixture path
    val extQ = spark.read.parquet(s"$path/data")
      .filter(col("vec_id") < Similarity.NumQueries)
      .select(col("vec_id"), col("v"), col("nrm"))
    val ext = Similarity.topKIvfServedFor(extQ, path, nProbe)
      .orderBy("q_id", "rank").collect().toSeq
    assert(ext == served.orderBy("q_id", "rank").collect().toSeq)
    // an empty append batch is a no-op (dynamic overwrite, no partitions)
    Similarity.appendToIvfIndex(batch.filter(lit(false)), path, 2L)
    assert(spark.read.parquet(s"$path/data").count() == n1)
  }

  test("IVF drift monitor: in-distribution batch passes, shifted batch flags rebuild") {
    val e = Tables(spark, Sf0001).embeddings
    val path = java.nio.file.Files.createTempDirectory("ivfdrift").toString
    Similarity.writeIvfIndex(e, path)
    // a batch drawn from the indexed distribution (an unshifted slice):
    // its distance profile matches the build's -> no rebuild
    val inDist = e.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id"), col("embedding"))
    val ok = Similarity.ivfIndexDrift(spark, path, inDist).head()
    assert(!ok.getAs[Boolean]("rebuild_recommended"))
    assert(ok.getAs[Double]("drift_ratio") < Similarity.DriftRebuildRatio)
    // the same slice shifted +1.0 per component: distances blow up by
    // ~dim, the monitor must demand a rebuild
    val shifted = inDist.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => x + lit(1.0)).as("embedding"))
    val bad = Similarity.ivfIndexDrift(spark, path, shifted).head()
    assert(bad.getAs[Boolean]("rebuild_recommended"))
    assert(bad.getAs[Double]("drift_ratio")
      > ok.getAs[Double]("drift_ratio") * 10)
    // build-side stats are batch-independent
    assert(ok.getAs[Double]("p95_d2_index")
      == bad.getAs[Double]("p95_d2_index"))
  }

  test("adaptive IVF routes flat below the cell ceiling, hier above") {
    val e = Tables(spark, Sf0001).embeddings
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "rank", "vec_id", "cosine")
      .orderBy("q_id", "rank").collect().toSeq
    assert(rows(Similarity.topKIvfAdaptive(e, Similarity.IvfCells,
        Similarity.IvfProbes))
      == rows(Similarity.topKIvf(e, Similarity.IvfCells,
        Similarity.IvfProbes)))
    val past = Similarity.IvfFlatMaxCells + 1
    assert(rows(Similarity.topKIvfAdaptive(e, past, 8))
      == rows(Similarity.topKIvfHier(e, past, 8)))
  }

  test("PQ ANN: valid codes, recall vs brute force, exact re-rank") {
    import graft.ext.ProductQuant
    val emb = Tables(spark, Sf0001).embeddings
    val cbs = ProductQuant.trainCodebooks(emb)
    assert(cbs.size == ProductQuant.NumSubspaces)
    assert(cbs.forall(_.size == ProductQuant.CodebookK))
    assert(cbs.forall(_.forall(_.size == ProductQuant.SubDim)))
    // codes are in [0, K) — the 4-bit/byte-code compression claim
    val codes = emb
      .select(ProductQuant.encodeExpr(
        col("embedding").cast("array<double>"), cbs).as("c"))
      .select(explode(col("c")).as("k"))
    assert(codes.filter(col("k") < 0
      || col("k") >= ProductQuant.CodebookK).count() == 0)
    // ADC + shortlist re-rank recovers most of the true top-k. The
    // measured 0.88 (pinned at a 0.8 floor) is the honest K=16 ceiling
    // on clustered data: all members of a cluster quantize to the SAME
    // codes, so ADC cannot discriminate inside a cluster and the
    // shortlist tie-breaks by id — the scale remedy is K=256 codebooks
    // (byte codes), not a bigger shortlist.
    val pq = ProductQuant.topKPq(emb)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.topKBruteForce(emb)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"PQ recall@${Similarity.TopK} = $recall")
    // winners carry exact cosine: spot-check one against brute force
    val b = Similarity.topKBruteForce(emb)
      .select("q_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ProductQuant.topKPq(emb).select("q_id", "vec_id", "cosine").collect()
      .foreach { r =>
        b.get((r.getLong(0), r.getLong(1))).foreach { exact =>
          assert(math.abs(r.getDouble(2) - exact) < 1e-12)
        }
      }
  }

  test("LSH-pruned PQ: bucket-restricted ADC scan still finds neighbors") {
    import graft.ext.ProductQuant
    val emb = Tables(spark, Sf0001).embeddings
    // 4 planes on the 200-vector fixture: ~12 vectors per bucket, so the
    // probe set actually holds candidates (at the default 8, 256 buckets
    // over 200 vectors leave probes near-empty — occupancy must track
    // corpus size, the numPlanesFor contract)
    val planes = 4
    val pruned = ProductQuant.topKPqLshPruned(emb, planes)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.topKBruteForce(emb)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall is bounded by the probe set's coverage (measured 0.40 at 4
    // planes on this fixture — a bucket-geometry property, not a PQ
    // one), so pin RELATIVE to the exact-scoring multi-probe LSH on the
    // same probe set: the ADC shortlist + re-rank must recover ≥85 % of
    // what exact in-bucket scoring finds
    val lshRef = Similarity.topKLshMultiProbe(emb, planes)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pruned intersect brute).size.toDouble / brute.size
    val refRecall = (lshRef intersect brute).size.toDouble / brute.size
    assert(recall >= 0.85 * refRecall,
      s"LSH-pruned PQ recall $recall vs exact-scoring reference $refRecall")
    // every returned candidate really came from a probed bucket: its
    // sign bucket is within Hamming 1 of its query's bucket
    import org.apache.spark.sql.functions.{col => c}
    val buckets = emb
      .select(c("vec_id"), Similarity.bucketExpr(
        c("embedding").cast("array<double>"), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pruned.foreach { case (q, v) =>
      val ham = java.lang.Long.bitCount(buckets(q) ^ buckets(v))
      assert(ham <= 1, s"pair ($q,$v) at hamming $ham")
    }
  }

  test("multi-probe LSH: candidates within Hamming 1; recall ≥ single-probe") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, Sf0001).embeddings
    val brute = Similarity.topKBruteForce(e)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = hits(Similarity.topKLsh(e))
    val multi = hits(Similarity.topKLshMultiProbe(e))
    val rSingle = single.intersect(brute).size.toDouble / brute.size
    val rMulti = multi.intersect(brute).size.toDouble / brute.size
    info(f"LSH recall@${Similarity.TopK}: single-probe $rSingle%.2f, "
      + f"multi-probe $rMulti%.2f")
    assert(rMulti >= rSingle)
    // every candidate's bucket is within Hamming 1 of its query's bucket
    val withBucket = e
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", Similarity.bucketExpr(col("v")))
      .select("vec_id", "bucket")
    val joined = Similarity.topKLshMultiProbe(e)
      .join(withBucket.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("bucket", "qb"), Seq("q_id"))
      .join(withBucket, Seq("vec_id"))
    assert(joined
      .filter(bit_count(col("bucket").bitwiseXOR(col("qb"))) > 1)
      .count() == 0)
  }

  test("ANN-bucketed embedding dedup pairs share the LSH bucket") {
    graft.functions.GraftFunctions.register(spark)
    val e = Tables(spark, Sf0001).embeddings
    val withBucket = e
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", Similarity.bucketExpr(col("v")))
      .select("vec_id", "bucket")
    val pairs = Dedup.embeddingNearDupsAnn(e)
    assert(pairs.count() > 0)
    // every reported pair's two sides really share the reported bucket
    val joined = pairs
      .join(withBucket.withColumnRenamed("vec_id", "vec_a")
        .withColumnRenamed("bucket", "ba"), Seq("vec_a"))
      .join(withBucket.withColumnRenamed("vec_id", "vec_b")
        .withColumnRenamed("bucket", "bb"), Seq("vec_b"))
    assert(joined.filter(col("ba") =!= col("bucket")
      || col("bb") =!= col("bucket")).count() == 0)
    // rank bounded per bucket
    assert(pairs.groupBy("bucket").count()
      .filter(col("count") > Dedup.TopPairsPerLabel).count() == 0)
  }

  test("approx length quantiles track the exact ones within rank error") {
    val docs = Tables(spark, Sf0001).documents
    val exact = TextAnalysis.lengthQuantiles(docs).orderBy("lang").collect()
    val approx = TextAnalysis.lengthQuantilesApprox(docs).orderBy("lang")
      .collect()
    assert(exact.length == approx.length)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      for ((col, i) <- Seq("p50" -> 2, "p90" -> 3, "p99" -> 4)) {
        val ev = e.getDouble(i)
        val av = a.getLong(i).toDouble // sketch returns an observed value
        val rel = math.abs(av - ev) / math.max(ev, 1.0)
        assert(rel <= 0.05,
          f"$col lang=${e.getString(0)}: exact=$ev%.1f approx=$av%.1f")
      }
    }
  }

  test("text stats: hand-computed quality on a tiny doc") {
    val d = docsDF(Seq((1L, "the cat sat on the mat")))
    val r = TextAnalysis.textStats(d).head()
    assert(r.getAs[Long]("n_tokens") == 6)
    assert(r.getAs[Long]("n_distinct") == 5)   // 'the' twice
    assert(r.getAs[Double]("stopword_ratio") == round6(2.0 / 6))
    // ppm terms: 6*2000=12000, round(5*3e5/6)=250000, 3e5-round(2*3e5/6)=200000
    assert(r.getAs[Double]("quality_score") == (12000 + 250000 + 200000) / 1e6)
  }

  test("repetition report flags looped phrases, passes varied text") {
    val docs = docsDF(Seq(
      (1L, "a a a a"), // dup 3/4 = 750000 ppm; top bigram 3/3 = 10^6 ppm
      (2L, "twelve distinct words in this sentence make a varied clean doc")))
    val r = TextAnalysis.repetitionReport(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("dup_word_ppm") == 750000L)
    assert(r(0).getAs[Long]("top_bigram_ppm") == 1000000L)
    assert(r(0).getAs[Boolean]("repetition_flag"))
    assert(r(1).getAs[Long]("dup_word_ppm") == 0L)
    // 11 words -> 10 unique bigrams -> top share 1/10, under the gate
    assert(r(1).getAs[Long]("top_bigram_ppm") == 100000L)
    assert(!r(1).getAs[Boolean]("repetition_flag"))
  }

  test("repetition bigram gate skips short docs; dup-word gate still bites") {
    val docs = docsDF(Seq(
      // fully varied 6 tokens: top bigram share 200000 ppm would trip the
      // gate without the RepetitionMinWords floor
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one"),               // 1 token, clamped bigram -> 10^6 share
      (3L, "spam spam spam")))   // short but dup-word-flagged (2/3 dup)
    val r = TextAnalysis.repetitionReport(docs).orderBy("doc_id").collect()
    assert(!r(0).getAs[Boolean]("repetition_flag"))
    assert(!r(1).getAs[Boolean]("repetition_flag"))
    assert(r(2).getAs[Boolean]("repetition_flag"))
  }

  test("quality filter rules: planted docs fail exactly as computed") {
    val docs = docsDF(Seq(
      // 1: clean — 21 tokens, varied, stopwords, mean len 86/21 ≈ 4.10
      (1L, "the quick brown fox jumps over azure lazy dog and then runs " +
        "far away into green fields of tall grass today"),
      // 2: min_tokens (3) + stopword_floor (0 distinct)
      (2L, "tiny little doc"),
      // 3: mean_word_len_low only — 25 distinct short tokens, mean 49/25
      (3L, "a of to in is ab cd ef gh ij kl mn op qr st uv wx yz " +
        "aa bb cc dd ee ff gg"),
      // 4: symbol_ratio (6/21) — also mean-low (74/21)
      (4L, "the !!! ### $$$ %%% of a and !!! ### is to in " +
        "longish wording here now more plain simple words"),
      // 5: digit_ratio (13/20) — also mean-low (48/20)
      (5L, "the 42 17 99 360 2048 of 512 a 1024 77 812 " +
        "and 13 is 15 to 16 in 17"),
      // 6: stopword_floor only (20 varied greek letters, mean 86/20)
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      // 7: ttr_floor (5 distinct / 123 tokens; mean 516/123 ≈ 4.2)
      (7L, "the of a " + Seq.fill(30)("looping the of words").mkString(" "))
    ))
    val r = TextAnalysis.qualityFilterReport(docs).collect()
      .map(x => x.getAs[String]("rule") ->
        (x.getAs[Long]("n_failed"), x.getAs[Long]("failed_id_sum"))).toMap
    assert(r("min_tokens") == (1L, 2L))
    assert(r("max_tokens") == (0L, 0L))
    assert(r("mean_word_len_low") == (3L, 12L)) // docs 3, 4, 5
    assert(r("mean_word_len_high") == (0L, 0L))
    assert(r("symbol_ratio") == (1L, 4L))
    assert(r("digit_ratio") == (1L, 5L))
    assert(r("stopword_floor") == (2L, 8L))     // docs 2, 6
    assert(r("ttr_floor") == (1L, 7L))
    // the composed gate keeps exactly the docs failing no rule
    val kept = TextAnalysis.qualityFilter(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("vocab coverage: OOV counts against the deterministic top-k vocab") {
    import org.apache.spark.sql.functions.{col => c}
    // vocab k=2 over {a:4, b:3, x:1, y:1, z:1}: vocab = {a, b};
    // src1 stream = a a b x (1 OOV of 4), src2 = a a b b y z (2 of 6)
    val docs = docsDF(Seq(
      (1L, "a a b x"), (2L, "a a b b y z")))
      .withColumn("source",
        when(c("doc_id") === 1, "src1").otherwise("src2"))
    val r = TextAnalysis.vocabCoverage(docs, k = 2)
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov"),
          x.getAs[Long]("oov_ppm"))).toMap
    assert(r("src1") == (4L, 1L, 250000L))
    assert(r("src2") == (6L, 2L, 333333L))
  }

  test("novelty: shared 5-gram runs lower the score, fresh text scores 1.0") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val d = docsDF(Seq(
      (1L, s"$shared a1 a2 a3 a4 a5"),
      (2L, s"$shared b1 b2 b3 b4 b5"),
      (3L, "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10")))
    val r = TextAnalysis.noveltyReport(d).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getDouble(3))).toMap
    assert(r(3L) == 1.0) // no gram appears elsewhere
    assert(r(1L) < 1.0 && r(2L) < 1.0) // the shared run is non-novel
    // the 8-token shared prefix yields 4 shared 5-grams of doc 1's 9
    assert(math.abs(r(1L) - (1.0 - 4.0 / 9.0)) < 1e-6)
  }

  test("incremental novelty scores a batch against the stored gram index") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val corpus = docsDF(Seq(
      (1L, s"$shared a1 a2 a3 a4 a5"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")))
    val batch = docsDF(Seq(
      (10L, s"$shared x1 x2 x3 x4 x5"), // prefix known to the corpus
      (11L, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"), // fully fresh
      (12L, "z1 z2 z3 z4 z5 z6 z7 z8"),
      (13L, "z1 z2 z3 z4 z5 z6 z7 z8"))) // batch-internal duplicate
    val idx = TextAnalysis.gramIndex(corpus)
    val r = TextAnalysis.noveltyAgainst(idx, batch).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getDouble(3))).toMap
    assert(r(10L) < 1.0) // shared prefix is non-novel vs the index
    assert(r(11L) == 1.0) // fresh content untouched by index or batch
    assert(r(12L) == 0.0 && r(13L) == 0.0) // intra-batch dup: all common
    // batch-vs-self consistency: 10's shared-gram count matches full-pass
    assert(math.abs(r(10L) - (1.0 - 4.0 / 9.0)) < 1e-6)
  }

  test("incremental novelty tolerates duplicate gram rows in the index") {
    // an uncompacted streaming index holds the same gram under several
    // batch_id partitions; each duplicate must match a batch gram at
    // most once (regression: the probe join used to fan out per copy,
    // inflating n_grams/n_common)
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val corpus = docsDF(Seq(
      (1L, s"$shared a1 a2 a3 a4 a5"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")))
    val batch = docsDF(Seq(
      (10L, s"$shared x1 x2 x3 x4 x5"),
      (11L, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10")))
    val idx = TextAnalysis.gramIndex(corpus)
    val tripled = idx.union(idx).union(idx)
    val clean = TextAnalysis.noveltyAgainst(idx, batch).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(3)))
    val dup = TextAnalysis.noveltyAgainst(tripled, batch).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(3)))
    assert(dup.sameElements(clean))
    assert(clean.find(_._1 == 10L).get._2 == 9L) // n_grams not inflated
  }

  test("language ID picks the language with most lexicon hits") {
    val d = docsDF(Seq(
      (1L, "der hund und die katze ist hier"),
      (2L, "the dog and a cat is here"),
      (3L, "xyzzy plugh quux")))
    val r = TextAnalysis.langIdConfusion(d)
      .select("predicted").collect().map(_.getString(0)).toSet
    assert(r == Set("de", "en", "und"))
  }

  test("multimodal stub decode is deterministic and schema-typed") {
    val f = Multimodal.features(twins)
    val r = f.orderBy("doc_id").collect()
    assert(r.length == 3)
    val first = r(0)
    assert(first.getAs[String]("kind") == "text/plain")
    assert(first.getAs[Long]("n_bytes") == 62)
    assert(first.getAs[Long]("n_frames") == 1)
    val w = first.getAs[Long]("fake_width")
    assert(w >= 320 && w < 1920)
    // idempotent: same input, same features
    assert(Multimodal.features(twins).orderBy("doc_id").collect()
      .sameElements(r))
  }

  test("multimodal decoder seam: a custom codec drops in without plan changes") {
    import Multimodal.{MediaDecoder, MediaRecord, MediaFeatures}
    // A stand-in "real codec": derives dimensions from the actual payload
    // bytes (first two bytes), with a per-PARTITION context allocation —
    // the shape a libjpeg/ffmpeg wrapper takes.
    object HeaderCodec extends MediaDecoder {
      override def decodePartition(records: Iterator[MediaRecord])
          : Iterator[MediaFeatures] = {
        // context allocated once per partition, before the stream
        val ctx = new java.util.concurrent.atomic.AtomicLong(0)
        records.map { r =>
          ctx.incrementAndGet()
          val w = 1L + (r.payload.headOption.getOrElse(0: Byte) & 0xff)
          val h = 1L + (r.payload.drop(1).headOption.getOrElse(0: Byte) & 0xff)
          MediaFeatures(r.doc_id, r.kind, r.n_bytes, "", r.n_bytes, w, h,
            w, h, 0L, s"decoded_in_ctx_${ctx.get()}")
        }
      }
    }
    val custom = Multimodal.features(twins, HeaderCodec)
    val rows = custom.orderBy("doc_id").collect()
    assert(rows.length == 3)
    // dimensions really came from payload bytes, not the stub hash
    val t0 = twins.orderBy("doc_id").select("text").head().getString(0)
    assert(rows(0).getAs[Long]("fake_width") == 1L + t0.head.toLong)
    // same plan shape for both decoders: a single deserialize→map→serialize
    // chain over the scan, no Exchange — mediaRecords carries REAL
    // payload bytes from the scanned rows, and shuffling those is what
    // a production decode stage must not do (split sizing, not an
    // exchange, is that path's parallelism lever)
    for (df <- Seq(custom, Multimodal.features(twins))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"decode plan must not shuffle:\n$plan")
    }
    // the SYNTHESIZING stats paths spread ids before the codec stage:
    // a one-file corpus inherits ONE scan partition, which would
    // serialize the whole encode+decode chain on one core at sf1+ —
    // the pin is ONE round-robin exchange moving ONLY the 8-byte
    // doc_id projection (never payload bytes: the payload columns are
    // born in the mapPartitions ABOVE the exchange)
    val docs = Tables(spark, Sf0001).documents
    for (df <- Seq(Multimodal.imageStats(docs), Multimodal.audioStats(docs))) {
      // sparkPlan, not executedPlan: AQE's wrapper node hides the
      // inner tree from collect()
      val plan = df.queryExecution.sparkPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.size == 1,
        s"stats codec paths spread ids exactly once:\n$plan")
      assert(exchanges.head.child.output.map(_.name) == Seq("doc_id"),
        "the spread must move only the id projection, never payloads")
      assert(exchanges.head.outputPartitioning.numPartitions
        == spark.sparkContext.defaultParallelism,
        "the codec stage must fan out to every core")
    }
  }

  test("image near-dup: pairs are exactly the planted perceptual twins") {
    val docs = Tables(spark, Sf0001).documents
    val pairs = Multimodal.imageNearDups(docs).collect()
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val twins = ids.filter(i => i % 10 == 7 && ids.contains(i - 7))
      .map(i => (i - 7, i))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == twins,
      "band join + Hamming gate must find every twin and nothing else")
    // the sum-neutral two-pixel nudge means only cells (0,0) and (1,0)
    // can flip: twin Hamming is <= 2 DETERMINISTICALLY (not just <= the
    // radius), so this exact-equality assertion cannot flake at other
    // fixture sizes
    assert(pairs.forall(_.getLong(2) <= 2L))
    // the nudge is perceptual, not byte-identity:
    // payload bytes differ even when the aHash agrees
    val t = twins.head
    assert(!java.util.Arrays.equals(Multimodal.pngHashPayload(t._1),
      Multimodal.pngHashPayload(t._2)))
    // the nudge must NOT mod-wrap: a seed whose pixel(0,0) red channel
    // is 253-255 (the would-wrap zone) must still pair with its twin
    import spark.implicits._
    val hotSeed = Iterator.from(0, 10).map(_.toLong).find(s =>
      graft.ext.Hashing.jvmH32(s"img|$s|0|0") % 256 >= 253).get
    val hotPair = Multimodal.imageNearDups(
      Seq(hotSeed, hotSeed + 7).toDF("doc_id")).collect()
    assert(hotPair.map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((hotSeed, hotSeed + 7)),
      s"high-channel twin (seed $hotSeed) must survive the nudge")
  }

  test("aHash real decode equals the closed form; malformed payload excluded") {
    import spark.implicits._
    import Multimodal.{ImageAHash, MediaCodec, MediaRecord}
    // closed-form twin of the decoder, straight from the generator hash
    def refAHash(docId: Long): (Long, Long) = {
      val seed = if (docId % 10 == 7) docId - 7 else docId
      val s =
        if (graft.ext.Hashing.jvmH32(s"img|$seed|0|0") % 256 >= 253) -3L
        else 3L
      val gray = for (y <- 0 until 8; x <- 0 until 8) yield {
        val hv = graft.ext.Hashing.jvmH32(s"img|$seed|$x|$y")
        var r = if (x == 1 && y == 0) 3 + hv % 250 else hv % 256
        if (docId % 10 == 7 && y == 0) {
          if (x == 0) r += s else if (x == 1) r -= s
        }
        (r + (hv / 256) % 256 + (hv / 65536) % 256) / 3
      }
      val sum = gray.sum
      gray.zipWithIndex.foldLeft((0L, 0L)) { case ((lo, hi), (g, i)) =>
        if (g * 64 > sum)
          if (i < 32) (lo | (1L << i), hi) else (lo, hi | (1L << (i - 32)))
        else (lo, hi)
      }
    }
    val out = Multimodal.PngAHashDecoder.decodePartition(
      Seq(3L, 17L).map { id =>
        val p = Multimodal.pngHashPayload(id)
        MediaRecord(id, p, "image/png", p.length.toLong)
      }.iterator).toSeq
    out.foreach { h =>
      val (lo, hi) = refAHash(h.doc_id)
      assert(h.decoded && h.ahash_lo == lo && h.ahash_hi == hi,
        s"real-decode aHash must equal the closed form for ${h.doc_id}")
    }
    // a codec that rejects everything: rows flagged, near-dup excludes
    object RejectAll extends MediaCodec[ImageAHash] {
      override def decodePartition(rs: Iterator[MediaRecord]) =
        rs.map(r => ImageAHash(r.doc_id, decoded = false, 0L, 0L))
    }
    val docs = Seq((7L, "t"), (0L, "t")).toDF("doc_id", "text")
    assert(Multimodal.imageAHashes(docs).filter(!col("decoded"))
      .count() == 0, "fixture payloads must all decode")
    assert(Multimodal.imageNearDups(docs, RejectAll).count() == 0,
      "undecodable payloads must not pair")
  }

  test("audio near-dup: pairs are exactly the planted twins; decode equals closed form") {
    import Multimodal.MediaRecord
    val docs = Tables(spark, Sf0001).documents
    val pairs = Multimodal.audioNearDups(docs).collect()
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val twins = ids.filter(i => i % 10 == 7 && ids.contains(i - 7))
      .map(i => (i - 7, i))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == twins)
    assert(pairs.forall(_.getLong(2) <= Multimodal.AHashMaxHamming))
    // payload bytes differ even when the fingerprint pairs
    val t = twins.head
    assert(!java.util.Arrays.equals(Multimodal.wavFpPayload(t._1),
      Multimodal.wavFpPayload(t._2)))
    // real-decode fingerprint == closed form from the generator hash
    def refFp(docId: Long): (Long, Long) = {
      val seed = if (docId % 10 == 7) docId - 7 else docId
      val s = (0 until Multimodal.AFpFrames).map { i =>
        val hv = graft.ext.Hashing.jvmH32(s"aud|$seed|$i")
        if (docId % 10 == 7 && i == 0) ((hv % 4001 + 7) % 4001) - 2000
        else (hv % 4001) - 2000
      }
      val e = s.grouped(Multimodal.AFpWindow)
        .map(_.map(v => v * v).sum).toIndexedSeq
      (0 until 64).foldLeft((0L, 0L)) { case ((lo, hi), w) =>
        if (e(w) > e((w + 1) % 64))
          if (w < 32) (lo | (1L << w), hi) else (lo, hi | (1L << (w - 32)))
        else (lo, hi)
      }
    }
    val out = Multimodal.WavFpDecoder.decodePartition(
      Seq(4L, 27L).map { id =>
        val p = Multimodal.wavFpPayload(id)
        MediaRecord(id, p, "audio/wav", p.length.toLong)
      }.iterator).toSeq
    out.foreach { h =>
      val (lo, hi) = refFp(h.doc_id)
      assert(h.decoded && h.fp_lo == lo && h.fp_hi == hi,
        s"real-decode fingerprint must equal closed form for ${h.doc_id}")
    }
    // wrong geometry (stats fixture wav: stereo/variable frames) is
    // flagged, not mis-fingerprinted
    val alien = Multimodal.wavPayload(6L)
    val rej = Multimodal.WavFpDecoder.decodePartition(Iterator(
      MediaRecord(6L, alien, "audio/wav", alien.length.toLong))).toSeq
    assert(rej.exists(r => r.doc_id == 6L && !r.decoded))
  }

  test("video near-dup: pairs are the planted twins; demux strict; order-sensitive") {
    import Multimodal.MediaRecord
    val docs = Tables(spark, Sf0001).documents
    val pairs = Multimodal.videoNearDups(docs).collect()
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val twins = ids.filter(i => i % 10 == 7 && ids.contains(i - 7))
      .map(i => (i - 7, i))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == twins,
      "band join + Hamming gate must find every twin and nothing else")
    assert(pairs.forall(_.getLong(2) <= Multimodal.AHashMaxHamming))
    // the one-frame flicker is perceptual, not byte-identity
    val t = twins.head
    assert(!java.util.Arrays.equals(Multimodal.videoPayload(t._1),
      Multimodal.videoPayload(t._2)))
    // real demux + per-frame decode == closed form from the generator hash
    def refFp(docId: Long): (Long, Long) = {
      val seed = if (docId % 10 == 7) docId - 7 else docId
      val delta = for (y <- 0 until 8; x <- 0 until 8) yield
        (0 until Multimodal.VFpFrames).map { f =>
          val hv = graft.ext.Hashing.jvmH32(s"vid|$seed|$f|$x|$y")
          var r = hv % 256
          if (docId % 10 == 7 && f == 0 && x == 0 && y == 0)
            r = if (r >= 253) r - 3 else r + 3
          val g = (r + (hv / 256) % 256 + (hv / 65536) % 256) / 3
          if (f % 2 == 0) g else -g
        }.sum
      delta.zipWithIndex.foldLeft((0L, 0L)) { case ((lo, hi), (d, i)) =>
        if (d > 0)
          if (i < 32) (lo | (1L << i), hi) else (lo, hi | (1L << (i - 32)))
        else (lo, hi)
      }
    }
    def fpOf(id: Long, payload: Array[Byte]) =
      Multimodal.GvidFpDecoder.decodePartition(Iterator(
        MediaRecord(id, payload, "video/x-gvid",
          payload.length.toLong))).next()
    for (id <- Seq(3L, 17L)) {
      val out = fpOf(id, Multimodal.videoPayload(id))
      val (lo, hi) = refFp(id)
      assert(out.decoded && out.fp_lo == lo && out.fp_hi == hi,
        s"real demux+decode fingerprint must equal closed form for $id")
    }
    // frame-ORDER sensitivity: re-muxing doc 3's frames in reverse
    // negates every cell's temporal delta, so the reversed cut lands
    // far outside the near-dup radius (a temporal-mean hash would
    // call it identical). Demux the real container to get the frames.
    val fwd = Multimodal.videoPayload(3L)
    val fps = fpOf(3L, fwd)
    val rev = fpOf(3L, Multimodal.gvidMux(Multimodal.gvidDemux(fwd).reverse))
    assert(rev.decoded)
    val hamming = java.lang.Long.bitCount(fps.fp_lo ^ rev.fp_lo) +
      java.lang.Long.bitCount(fps.fp_hi ^ rev.fp_hi)
    assert(hamming > Multimodal.AHashMaxHamming,
      s"reversed clip must not be a near-dup (hamming $hamming)")
    // strict demux: bad magic, truncation, and trailing bytes all
    // reject (decoded=false), never a silent mis-fingerprint
    val badMagic = fwd.clone(); badMagic(0) = 'X'.toByte
    assert(!fpOf(3L, badMagic).decoded)
    assert(!fpOf(3L, fwd.take(fwd.length - 5)).decoded)
    assert(!fpOf(3L, fwd ++ Array[Byte](0)).decoded)
    // a corrupt frame LENGTH rejects BEFORE allocating: a wire-claimed
    // ~2 GB frame would otherwise throw OutOfMemoryError (an Error the
    // Exception handler never sees) and kill the ingest task
    val evilLen = fwd.clone()
    evilLen(8) = 0xff.toByte; evilLen(9) = 0xff.toByte
    evilLen(10) = 0xff.toByte; evilLen(11) = 0x7f.toByte
    assert(!fpOf(3L, evilLen).decoded)
    val negLen = fwd.clone()
    negLen(11) = 0x80.toByte // sign bit -> negative int32 length
    assert(!fpOf(3L, negLen).decoded)
  }

  test("GVID demux is total under random corruption and truncation") {
    import Multimodal.MediaRecord
    val rnd = new scala.util.Random(7)
    val base = Multimodal.videoPayload(5L)
    val cases = Iterator.tabulate(300) { t =>
      if (t % 3 == 0) base.take(rnd.nextInt(base.length + 1)) // truncate
      else {
        val p = base.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          p(rnd.nextInt(p.length)) = rnd.nextInt(256).toByte }
        p
      }
    }
    // decodePartition must never throw — every corruption either still
    // decodes (flipped bytes inside PNG payloads PNG itself tolerates)
    // or rejects with decoded=false; no Error may escape to the task
    val out = Multimodal.GvidFpDecoder.decodePartition(
      cases.zipWithIndex.map { case (p, i) =>
        MediaRecord(i.toLong, p, "video/x-gvid", p.length.toLong)
      }).toSeq
    assert(out.size == 300)
    info(s"rejected ${out.count(!_.decoded)} / 300 corrupted payloads")
  }

  test("cross-modal clusters aggregate evidence across all three codecs") {
    val docs = Tables(spark, Sf0001).documents
    val rows = Multimodal.mediaDedupClusters(docs).collect()
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val anchors = ids.filter(i => i % 10 == 7 && ids.contains(i - 7))
      .map(_ - 7)
    // one cluster per planted twin pair, labeled by its min id; every
    // pair is flagged by all three independent perceptual channels
    assert(rows.map(_.getLong(0)).toSet == anchors)
    rows.foreach { r =>
      assert(r.getLong(1) == 2L, s"cluster size: $r")
      assert(r.getLong(2) == 3L, s"pair evidence: $r")
      assert(r.getLong(3) == 3L, s"modalities: $r")
    }
  }

  test("corpus clusters count text as a modality and merge across channels") {
    import spark.implicits._
    // planted text+image twin: ONLY those two channels flag the pair —
    // n_modalities must read exactly 2
    val media = Seq((1L, 2L, "image")).toDF("doc_a", "doc_b", "modality")
    val text = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val twin = Multimodal.corpusDedupClustersFromPairs(media, text)
      .collect()
    assert(twin.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == Seq((1L, 2L, 2L, 2L)),
      s"text+image twin must land in ONE cluster with n_modalities=2: " +
        twin.mkString(","))
    // a text pair BRIDGING into a media-twin cluster merges the
    // components, and the evidence counts all contributing channels
    val media2 = Seq((10L, 17L, "image"), (10L, 17L, "audio"))
      .toDF("doc_a", "doc_b", "modality")
    val bridge = Seq((5L, 10L)).toDF("doc_a", "doc_b")
    val merged = Multimodal.corpusDedupClustersFromPairs(media2, bridge)
      .collect()
    assert(merged.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == Seq((5L, 3L, 3L, 3L)),
      s"bridged cluster must merge with 3 modalities: ${merged.mkString(",")}")
    // on the fixture: the four-channel roll-up over the real pair
    // streams (served media index + stored band index) carries every
    // media cluster, adds text-only clusters, and counts text in
    // merged ones
    val docs = Tables(spark, Sf0001).documents
    val textPairs = graft.ext.Dedup.minhashNearDups(docs)
    val corpus = Multimodal.corpusDedupClusters(docs, textPairs).collect()
    val mediaOnly = Multimodal.mediaDedupClusters(docs).collect()
    assert(corpus.length >= mediaOnly.length,
      "adding a channel can only merge or add clusters, never drop docs")
    val byModalities = corpus.groupBy(_.getLong(3)).view
      .mapValues(_.length).toMap
    assert(byModalities.keySet.subsetOf(Set(1L, 3L, 4L)),
      s"fixture clusters are text-only, media-only, or merged: $byModalities")
    // the manifest over the same graph: one row per survivor, dropped
    // ids sorted, evidence = the sorted channel set
    val manifest = Multimodal.corpusDedupManifest(
        media.unionByName(Seq((1L, 2L, "audio"))
          .toDF("doc_a", "doc_b", "modality")), text)
      .collect()
    assert(manifest.map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getString(3))).toSeq
      == Seq((1L, 1L, "2", "audio,image,text")),
      s"manifest: ${manifest.mkString(",")}")
  }

  test("served media screens equal in-flight bit for bit; decode runs once") {
    val docs = Tables(spark, Sf0001).documents
    val path = java.nio.file.Files
      .createTempDirectory("mediafp").toString
    Multimodal.writeMediaFpIndex(docs, path)
    // each served screen ≡ its in-flight twin, row for row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(Multimodal.mediaNearDupsServed(spark, path, "image"))
      == rows(Multimodal.imageNearDups(docs)))
    assert(rows(Multimodal.mediaNearDupsServed(spark, path, "audio"))
      == rows(Multimodal.audioNearDups(docs)))
    assert(rows(Multimodal.mediaNearDupsServed(spark, path, "video"))
      == rows(Multimodal.videoNearDups(docs)))
    assert(rows(Multimodal.mediaDedupClustersServed(spark, path))
      == rows(Multimodal.mediaDedupClusters(docs)))
    // the served plans touch no codec: no generator/decode
    // mapPartitions anywhere in the physical tree — the whole point of
    // the index is that serving costs an index read, not a decode
    for (m <- Multimodal.MediaFpModalities) {
      val plan = Multimodal.mediaNearDupsServed(spark, path, m)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("MapPartitions"),
        s"served $m screen must not re-decode:\n$plan")
      assert(!plan.toLowerCase.contains("serializefromobject"),
        s"served $m screen must not leave codegen for a codec stage")
    }
    // undecodable payloads keep a flagged row in the index
    // (reject-don't-drop), and serving filters them like in-flight does
    val idx = Multimodal.readMediaFpIndex(spark, path)
    assert(idx.filter(col("decoded") === false).count() == 0,
      "fixture payloads must all decode")
    assert(idx.select("modality").distinct().count() == 3)
  }

  test("media fp index append: batch-only decode, cross-batch pairing, replay idempotent") {
    import spark.implicits._
    val docs = Tables(spark, Sf0001).documents
    val path = java.nio.file.Files
      .createTempDirectory("mediafp_app").toString
    // base: anchors only (every id ≡ 0 mod 10 — twins held back)
    Multimodal.writeMediaFpIndex(docs.filter(col("doc_id") % 10 === 0),
      path)
    val basePairs = Multimodal
      .mediaNearDupsServed(spark, path, "image").count()
    assert(basePairs == 0L, "anchors alone must not pair")
    // append the twins as a later batch: only THEY decode, and the
    // screen pairs them against base fingerprints across batch levels
    Multimodal.appendToMediaFpIndex(
      docs.filter(col("doc_id") % 10 === 7), path, batchId = 1L)
    def served(m: String) = Multimodal
      .mediaNearDupsServed(spark, path, m).collect().map(_.toSeq).toSeq
    val once = Multimodal.MediaFpModalities.map(m => m -> served(m)).toMap
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val twins = ids.filter(i => i % 10 == 7 && ids.contains(i - 7))
      .map(i => (i - 7, i))
    assert(once("image").map(r => (r(0), r(1))).toSet == twins,
      "appended twins must pair with base anchors across batch levels")
    // the full-corpus build serves the SAME answers — append ≡ rebuild
    val full = java.nio.file.Files
      .createTempDirectory("mediafp_full").toString
    Multimodal.writeMediaFpIndex(docs, full)
    for (m <- Multimodal.MediaFpModalities)
      assert(once(m) == Multimodal.mediaNearDupsServed(spark, full, m)
        .collect().map(_.toSeq).toSeq, s"append != rebuild for $m")
    // at-least-once replay rewrites exactly its own partitions: same rows
    Multimodal.appendToMediaFpIndex(
      docs.filter(col("doc_id") % 10 === 7), path, batchId = 1L)
    for (m <- Multimodal.MediaFpModalities)
      assert(served(m) == once(m), s"replay must be idempotent for $m")
  }

  test("real PNG codec: hand-built image decodes to exact pixel stats; malformed flagged") {
    import spark.implicits._
    import Multimodal.{MediaRecord, PngStatsDecoder}
    // hand-built 2x1 PNG: red pixel (255,0,0) then blue pixel (0,0,255)
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    // PNG magic must be on the wire (it's a real stream, not a stub)
    assert((png.take(4).map(_ & 0xff) sameElements Array(0x89, 0x50, 0x4e, 0x47)))
    val recs = Seq(
      MediaRecord(1L, png, "image/png", png.length.toLong),
      MediaRecord(2L, "not a png".getBytes("UTF-8"), "image/png", 9L))
    val out = PngStatsDecoder.decodePartition(recs.iterator).toSeq
    val ok = out.find(_.doc_id == 1L).get
    assert(ok.decoded && ok.width == 2 && ok.height == 1 && ok.n_pixels == 2)
    assert(ok.sum_r == 255 && ok.sum_g == 0 && ok.sum_b == 255)
    // checksum: red at (0,0) base=1 -> 255*1; blue at (1,0) base=2,
    // +2*wh=4 -> 255*(2+4)=1530; total 1785
    assert(ok.checksum == 255L * 1 + 255L * (2 + 2 * 2))
    val bad = out.find(_.doc_id == 2L).get
    assert(!bad.decoded && bad.width == 0 && bad.checksum == 0)

    // end-to-end over the fixture: every synthesized PNG decodes, and
    // the decoded geometry matches the generator's closed form
    val stats = Multimodal.imageStats(Tables(spark, Sf0001).documents)
      .collect()
    assert(stats.nonEmpty && stats.forall(_.getAs[Boolean]("decoded")))
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("width") == 8 + id % 9)
      assert(r.getAs[Long]("height") == 8 + id % 7)
    }
    // the codec path's one exchange is the pre-codec id spread (8-byte
    // ids only — the detailed structural pin lives in the decoder-seam
    // test); the codec stages themselves never shuffle
    val plan = Multimodal.imageStats(Tables(spark, Sf0001).documents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange RoundRobinPartitioning"),
      s"codec path must spread ids before decoding:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"only the id spread may shuffle:\n$plan")
  }

  test("winnow guarantee: a shared 20-token run collides; density bounds") {
    import graft.ext.Winnow
    val shared = (1 to 20).map(i => s"shared$i").mkString(" ")
    val d = docsDF(Seq(
      (1L, s"alpha beta gamma delta $shared epsilon zeta"),
      (2L, s"one two three four five six $shared seven eight nine"),
      (3L, "totally unrelated text about joins shuffles scans and codegen")))
    val pairs = Winnow.matches(d)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
    // the persisted fingerprint database serves the same matches
    val path = java.nio.file.Files.createTempDirectory("winnowfp").toString
    Winnow.writeFingerprintIndex(d, path)
    val served = Winnow.matchesServed(spark, path)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(served.toSet == pairs.toSet)
    // density: every window selects one gram, one selection covers at
    // most w windows -> n_fps >= ceil(windows/w); dedup keeps it well
    // under 1. Also pinned: the ~2/(w+1) expected density from the paper
    // holds loosely on real text.
    val fp = Winnow.fingerprintReport(d).collect()
    fp.foreach { r =>
      val grams = r.getAs[Long]("n_grams")
      val fps = r.getAs[Long]("n_fps")
      val windows = math.max(grams - Winnow.WindowW + 1, 1L)
      assert(fps >= (windows + Winnow.WindowW - 1) / Winnow.WindowW)
      assert(fps <= windows)
    }
  }

  test("native winnow_select ≡ expression-form selections, incl. ties") {
    import graft.ext.{Winnow, Hashing, TextAnalysis}
    graft.functions.GraftFunctions.register(spark)
    // ties (all-identical tokens → equal hashes) exercise the
    // rightmost-min tie-break in both forms; the 3-token doc exercises
    // the clamped single-window path (< w + k - 1 tokens)
    val d = docsDF(Seq(
      (1L, (1 to 40).map(i => s"tok${i % 13}").mkString(" ")),
      (2L, Seq.fill(25)("same").mkString(" ")),
      (3L, "just three tokens"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    val native = d.select(col("doc_id"), graft.functions.GraftFunctions
      .winnowSelect(col("text"), TextAnalysis.ShingleK, Winnow.WindowW)
      .as("sel"))
    val exprForm = d
      .select(col("doc_id"),
        transform(TextAnalysis.shingles(col("text")),
          s => Hashing.h32(s)).as("hs"))
      .select(col("doc_id"),
        Winnow.selectionsFromHashes(col("hs")).as("sel"))
    val n = native.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    val e = exprForm.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(n.keySet == e.keySet)
    n.keySet.foreach(id => assert(n(id) == e(id), s"doc $id"))
  }

  test("winnow matches score exact duplicates at overlap 1.0") {
    import graft.ext.Winnow
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val d = docsDF(Seq((1L, t), (2L, t),
      (3L, "different content entirely with no shared runs at all here")))
    val m = Winnow.matches(d).collect()
    assert(m.length == 1)
    assert(m.head.getAs[Long]("doc_a") == 1L)
    assert(m.head.getAs[Long]("doc_b") == 2L)
    assert(m.head.getAs[Double]("overlap_est") == 1.0)
  }

  test("quality classifier margin is the documented exact-integer form") {
    // n_tok=8, n_dist=8, sum_len=16, n_stop=7:
    //   16000 + 400000 + min(875000, 60000) - min(250000, 300000) - 300000
    val d = docsDF(Seq((1L, "the of and is to in a x")))
    val r = TextAnalysis.qualityClassifier(d).head()
    assert(r.getAs[Long]("margin_ppm") == -74000L)
    assert(!r.getAs[Boolean]("keep"))
    // a longer, diverse doc clears the bar; a repetitive one scores lower
    val pair = docsDF(Seq(
      (1L, (1 to 200).map(i => s"word$i").mkString(" ")),
      (2L, Seq.fill(200)("spam").mkString(" "))))
    val byId = TextAnalysis.qualityClassifier(pair).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Boolean]("keep"))
    assert(byId(1L).getAs[Long]("margin_ppm")
      > byId(2L).getAs[Long]("margin_ppm"))
    assert(!byId(2L).getAs[Boolean]("keep"))
  }

  test("learned quality coefficients: deterministic training, literal set exact, trained plan = literal plan") {
    val docs = Tables(spark, Sf0001).documents

    // the LITERAL coefficient set through the coefficient seam is the
    // verified quality_classifier row bit-for-bit
    val lit0 = TextAnalysis.qualityClassifier(docs).collect()
      .map(r => r.getAs[Long]("doc_id")
        -> (r.getAs[Long]("margin_ppm"), r.getAs[Boolean]("keep"))).toMap
    val viaSeam = TextAnalysis.qualityClassifierWith(docs,
        TextAnalysis.LiteralQualityCoefficients).collect()
      .map(r => r.getAs[Long]("doc_id")
        -> (r.getAs[Long]("margin_ppm"), r.getAs[Boolean]("keep"))).toMap
    assert(viaSeam == lit0)

    // deterministic fixed point: two trainings over the same corpus
    // produce bit-identical coefficients (integer-summed gradients —
    // partition order cannot leak in)
    val c1 = TextAnalysis.trainQualityCoefficients(docs, steps = 40)
    val c2 = TextAnalysis.trainQualityCoefficients(
      docs.repartition(7), steps = 40)
    assert(c1 == c2, s"training not deterministic: $c1 vs $c2")

    // the SHIPPED constants are the exact 60-step fixed point over
    // this corpus — provenance is reproducible, not asserted
    assert(TextAnalysis.trainQualityCoefficients(docs, steps = 60)
      == TextAnalysis.TrainedQualityCoefficientsSf0001)

    // the trained boundary mimics its teacher on the corpus (the
    // machinery pin, not a model-quality claim)
    val trained = TextAnalysis.qualityClassifierWith(docs, c1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    val agree = lit0.count { case (id, (_, k)) => trained(id) == k }
    assert(agree.toDouble / lit0.size >= 0.9,
      s"trained/teacher agreement ${agree.toDouble / lit0.size} " +
        s"(coef $c1)")

    // plan equality: the coefficient swap must not change the 100 TB
    // cost shape — both plans are one map-side projection over the
    // scan: no exchange, no aggregate, no join in either
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    Seq(shape(TextAnalysis.qualityClassifierWith(docs, c1)),
        shape(TextAnalysis.qualityClassifier(docs))).foreach { p =>
      assert(!p.contains("Exchange") && !p.contains("Aggregate")
        && !p.contains("Join"), p.take(400))
    }
  }

  test("source overlap reports containment per source pair") {
    import spark.implicits._
    val t1 = "a b c d e f g h i j"
    val d = Seq(
      (1L, t1, "en", "srcA", t1.length.toLong),
      (2L, t1, "en", "srcB", t1.length.toLong),
      (3L, "k l m n o p q r s t", "en", "srcC", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = graft.ext.Curation.sourceOverlap(d).collect()
    // only the (A,B) pair shares grams; C is disjoint -> absent
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("source_a") == "srcA")
    assert(r.getAs[String]("source_b") == "srcB")
    assert(r.getAs[Long]("inter") == 6L) // 10 tokens -> 6 distinct 5-grams
    assert(r.getAs[Double]("containment_a") == 1.0)
    assert(r.getAs[Double]("containment_b") == 1.0)
    assert(r.getAs[Double]("jaccard") == 1.0)
  }

  test("source overlap theta sketch: mod=1 degenerates to exact; sample is a subset") {
    val docs = Tables(spark, Sf0001).documents
    // with no sampling the estimators must reproduce the exact matrix
    val exact = graft.ext.Curation.sourceOverlap(docs)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    val unsampled = graft.ext.Curation.sourceOverlapApprox(docs, mod = 1)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    assert(unsampled.sameElements(exact))
    // at the default rate: pairs are a subset of the exact pair set and
    // set-size estimates stay within 3x of truth (deterministic sample)
    val exactPairs = exact.map(t => (t._1, t._2) -> t._3).toMap
    val approx = graft.ext.Curation.sourceOverlapApprox(docs).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(exactPairs.contains(key), s"pair $key not in exact matrix")
      val nEst = r.getLong(2)
      val nTrue = exactPairs(key)
      assert(nEst > nTrue / 3 && nEst < nTrue * 3, s"$key n_a est $nEst vs $nTrue")
    }
  }

  test("shards: deterministic, growth-stable, balanced, sorted on disk") {
    import graft.ext.Shards
    val docs = Tables(spark, Sf0001).documents
    val a1 = Shards.assign(docs).select("doc_id", "shard", "order_key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a2 = Shards.assign(docs).select("doc_id", "shard", "order_key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a1 == a2) // reproducible
    // growth stability: assignment depends only on doc_id, so a subset
    // corpus assigns its docs identically
    val sub = Shards.assign(docs.limit(50))
      .select("doc_id", "shard", "order_key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sub.subsetOf(a1))
    // balance: 16 shards over the fixture corpus, no shard 3x the mean
    val sizes = a1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.size == Shards.DefaultShards)
    val mean = a1.size.toDouble / sizes.size
    assert(sizes.values.max <= 3 * mean)
    // written shards come back sorted by order_key within each shard
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    Shards.writeShards(docs, dir)
    val back = spark.read.parquet(dir)
    import org.apache.spark.sql.functions.{col => c}
    (0 until Shards.DefaultShards).foreach { sh =>
      val keys = back.filter(c("shard") === sh)
        .select("order_key").collect().map(_.getLong(0))
      assert(keys.sameElements(keys.sorted), s"shard $sh unsorted")
    }
    assert(back.count() == docs.count())
  }

  test("Misra-Gries: bounds and capture hold under decrement pressure") {
    import spark.implicits._
    import graft.ext.HeavyHitters
    // adversarial stream: one true heavy hitter among a long uniform
    // tail, k=2 counters, several partitions — decrements MUST fire
    val stream = (Seq.fill(300)("hot")
      ++ (0 until 260).map(i => s"t${i % 26}"))
    val syms = spark.createDataset(
      new scala.util.Random(42).shuffle(stream)).repartition(5)
    val est = HeavyHitters.mergedCounters(syms, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // capture theorem: exact(hot)=300 > N/(k+1)=560/3 -> must survive
    assert(est.contains("hot"))
    // error bound on every surviving counter: est <= exact,
    // exact - est <= N/(k+1)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    est.foreach { case (s, e) =>
      assert(e <= exact(s), s"$s overestimated")
      assert(exact(s) - e <= 560 / 3, s"$s out of bound")
    }
    // and the sketch is genuinely lossy here: with 27 symbols in 2
    // counters, most of the tail cannot survive
    assert(est.size < 27)

    // the fixture-shaped report: every theorem row true, the planted
    // skew flagged must_capture
    val docs = Seq(
      (1L, "sun sea sand sky salt song table row", "en", "s", 8L),
      (2L, "sun sea sand sky salt song value part", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = HeavyHitters.report(docs, k = 2).collect()
    assert(rep.forall(_.getAs[Boolean]("bound_ok")))
    val s = rep.find(_.getAs[String]("symbol") == "s").get
    assert(s.getAs[Long]("exact_n") == 12L
      && s.getAs[Boolean]("must_capture"))
  }

  test("token entropy matches hand-computed distributions") {
    import spark.implicits._
    import graft.ext.TextAnalysis
    val docs = Seq(
      (1L, "a a a a"),    // degenerate: entropy 0
      (2L, "a b a b"),    // uniform over 2 types: ln 2
      (3L, "a a a b"))    // 0.75·ln(4/3) + 0.25·ln 4
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val r = TextAnalysis.tokenEntropy(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("entropy_nats") == 0.0
      && r(1L).getAs[Double]("entropy_ratio") == 0.0)
    assert(r(2L).getAs[Double]("entropy_nats") == round6(math.log(2))
      && r(2L).getAs[Double]("entropy_ratio") == 1.0)
    val h3 = 0.75 * math.log(4.0 / 3) + 0.25 * math.log(4.0)
    assert(math.abs(r(3L).getAs[Double]("entropy_nats") - h3) < 2e-6)
    assert(math.abs(r(3L).getAs[Double]("entropy_ratio")
      - h3 / math.log(2)) < 2e-6)
  }

  test("zipf fit: power law slopes to -1, uniform flattens, degenerate is NULL") {
    import spark.implicits._
    import graft.ext.TextAnalysis
    // source "p": token wi repeated floor(24/i) times, i=1..8 — an
    // exact-ish Zipf table; "u": every count 1 (flat: slope 0, r2
    // undefined); "s": one type (denx 0: both NULL)
    val pText = (1 to 8).flatMap(i => Seq.fill(24 / i)(s"w$i"))
      .mkString(" ")
    val docs = Seq((1L, "p", pText), (2L, "u", "a b c d e"),
      (3L, "s", "only"))
      .toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val r = TextAnalysis.zipfFit(docs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    // plain-double least squares as the reference (quantization error
    // is ~1e-9 per term, far under the tolerance)
    val cs = (1 to 8).map(24 / _).sortBy(-_)
    val xs = cs.indices.map(i => math.log(i + 1.0))
    val ys = cs.map(c => math.log(c.toDouble))
    val n = cs.size
    val (sx, sy) = (xs.sum, ys.sum)
    val num = n * xs.zip(ys).map { case (a, b) => a * b }.sum - sx * sy
    val denx = n * xs.map(a => a * a).sum - sx * sx
    val deny = n * ys.map(b => b * b).sum - sy * sy
    val p = r("p")
    assert(p.getAs[Long]("n_types") == 8L
      && p.getAs[Long]("n_tokens") == cs.sum.toLong)
    assert(math.abs(p.getAs[Double]("zipf_slope") - num / denx) < 1e-5)
    assert(math.abs(p.getAs[Double]("fit_r2")
      - num * num / (denx * deny)) < 1e-5)
    assert(p.getAs[Double]("zipf_slope") < -0.8
      && p.getAs[Double]("fit_r2") > 0.9)
    val u = r("u")
    assert(u.getAs[Double]("zipf_slope") == 0.0, "flat counts: slope 0")
    assert(u.isNullAt(u.fieldIndex("fit_r2")), "flat counts: r2 undefined")
    val s = r("s")
    assert(s.isNullAt(s.fieldIndex("zipf_slope"))
      && s.isNullAt(s.fieldIndex("fit_r2")), "one type: no fit")
  }

  test("length outliers: MAD gate survives the outlier it hunts") {
    import spark.implicits._
    import graft.ext.TextAnalysis
    // source A: lengths tightly at ~100 plus one 10_000-char monster;
    // the monster must flag, the 100s must not, and the threshold must
    // not have been dragged by the monster (robustness). Source B is
    // uniform — no flags even though its scale differs from A.
    val docs = ((1L to 9L).map(i => (i, "x", 100L + i % 3)) ++
      Seq((10L, "x", 10000L)) ++
      (11L to 15L).map(i => (i, "y", 5000L)))
      .map { case (i, s, n) => (i, "t", "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.lengthOutliers(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(10L).getAs[Boolean]("is_outlier"))
    assert((1L to 9L).forall(i => !r(i).getAs[Boolean]("is_outlier")))
    assert((11L to 15L).forall(i => !r(i).getAs[Boolean]("is_outlier")))
    // per-source stats: B's MAD is 0 and its med is its own scale
    assert(r(11L).getAs[Double]("med") == 5000.0
      && r(11L).getAs[Double]("mad") == 0.0)
  }

  test("hard negatives: in-band cross-label only, ranked hardest-first") {
    import spark.implicits._
    import graft.ext.Similarity
    val d = 4
    def v(xs: Double*): Array[Float] = {
      val a = xs.toArray.map(_.toFloat)
      a ++ Array.fill(d - a.length)(0.0f)
    }
    val c = 0.5   // in-band cosine vs anchor (1,0,..): between 0.35/0.75
    val s = math.sqrt(1 - c * c)
    // anchor id 0 label 0; candidates: near-dup (cos .99), in-band
    // cross-label (cos .5), in-band SAME-label (excluded), easy
    // negative (cos 0), in-band slightly-harder (cos .6)
    val vecs = Seq(
      (0L, v(1.0), 0),
      (100L, v(0.99, math.sqrt(1 - 0.99 * 0.99)), 1),  // above band
      (101L, v(c, s), 1),                               // in band
      (102L, v(c, s), 0),                               // same label
      (103L, v(0.0, 1.0), 1),                           // below band
      (104L, v(0.6, math.sqrt(1 - 0.36)), 2))           // in band, harder
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.hardNegatives(vecs)
      .filter(col("q_id") === 0L).orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSeq == Seq(104L, 101L))
    assert(r.map(_.getAs[Double]("cosine")).toSeq == Seq(0.6, 0.5))
    assert(r.forall(_.getAs[Int]("label") != 0))
  }

  test("jl projection preserves norms in expectation") {
    import spark.implicits._
    import graft.ext.EmbedStats
    // deterministic unit-ish vectors; JL with k=16 keeps each norm
    // within loose per-vector bounds and the MEAN ratio near 1
    val vecs = (0L until 40L).map { id =>
      (id, Array.tabulate(64)(d =>
        (((id * 31 + d * 17) % 200) / 100.0f - 1.0f)), 0)
    }.toDF("vec_id", "embedding", "label")
    graft.functions.GraftFunctions.register(spark)
    val orig = vecs.select(col("vec_id"),
      graft.ext.Dedup.dot(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("n2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val proj = EmbedStats.jlProject(vecs).collect()
      .groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rs) =>
        id -> rs.map(r => { val p = r.getAs[Double]("p"); p * p }).sum }
    assert(proj.size == 40 && proj.values.forall(_ > 0))
    val ratios = proj.map { case (id, n2) => n2 / orig(id) }
    ratios.foreach(r => assert(r > 0.1 && r < 3.0,
      s"per-vector distortion out of bounds: $r"))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean ratio $mean")
  }

  test("hll sketch index: pruned union serving + idempotent day upsert") {
    import spark.implicits._
    import graft.ext.SketchIndex
    def ev(rows: Seq[(Long, Long, Long)]) = rows  // (event_id, day, user)
      .map { case (e, d, u) => (e, d * 86400000L, u) }
      .toDF("event_id", "ms", "user_id")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withColumn("event_type", lit("click"))
    val base = ev((1L to 30L).map(i => (i, 100L + i % 3, i % 7)))
    val path = java.nio.file.Files
      .createTempDirectory("hllidx").toString + "/idx"
    SketchIndex.writeHllIndex(base, path)
    // day-window serving: days 100-101 hold users {1..6,0} anyway —
    // compare sketch estimate vs exact per window
    def served(f: Long, t: Long) =
      SketchIndex.distinctUsersOverRange(spark, path, f, t).collect()
    val all = served(100L, 102L)
    assert(all.length == 1
      && all(0).getAs[Long]("est_distinct") == 7L)
    // pruning: only the in-range day partitions are read
    val files = spark.read.parquet(path)
      .filter(col("day") >= 100L && col("day") <= 101L)
      .select(input_file_name()).distinct()
      .as[String].collect()
    assert(files.nonEmpty && files.forall(f =>
      f.contains("day=100") || f.contains("day=101")))
    // idempotent upsert: replay day 101 with DIFFERENT users; only
    // that day's sketch changes
    SketchIndex.upsertDays(
      ev((1L to 5L).map(i => (100 + i, 101L, 100L + i))), path)
    val after = served(101L, 101L)
    assert(after(0).getAs[Long]("est_distinct") == 5L)
    // day 102 (i % 3 == 2 → users cover all residues mod 7) untouched
    val untouched = served(102L, 102L)
    assert(untouched(0).getAs[Long]("est_distinct") == 7L)
  }

  test("real WAV codec: hand-built audio decodes to exact sample stats") {
    import Multimodal.{MediaRecord, WavStatsDecoder}
    // hand-built mono WAV: 3 samples 100, -200, 300 at 8 kHz
    val bb = java.nio.ByteBuffer.allocate(44 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 6)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(6)
      .putShort(100).putShort(-200).putShort(300)
    val wav = bb.array()
    val recs = Seq(
      MediaRecord(1L, wav, "audio/wav", wav.length.toLong),
      MediaRecord(2L, "not audio".getBytes("UTF-8"), "audio/wav", 9L))
    val out = WavStatsDecoder.decodePartition(recs.iterator).toSeq
    val ok = out.find(_.doc_id == 1L).get
    assert(ok.decoded && ok.sample_rate == 8000L && ok.channels == 1L
      && ok.n_frames == 3L)
    assert(ok.sum_amp == 200L && ok.sum_sq == 100L * 100 + 200L * 200
      + 300L * 300)
    // checksum: 100·1 + (−200)·2 + 300·3 = 600
    assert(ok.checksum == 600L)
    assert(!out.find(_.doc_id == 2L).get.decoded)

    // end-to-end over the fixture: every synthesized WAV decodes with
    // the generator's closed-form geometry, and the plan never shuffles
    val stats = Multimodal.audioStats(Tables(spark, Sf0001).documents)
      .collect()
    assert(stats.nonEmpty && stats.forall(_.getAs[Boolean]("decoded")))
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_frames") == 64 + id % 129)
      assert(r.getAs[Long]("channels") == 1 + id % 2)
    }
    // one exchange: the pre-codec id spread (see the decoder-seam pin)
    val plan = Multimodal.audioStats(Tables(spark, Sf0001).documents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Exchange RoundRobinPartitioning"),
      s"codec path must spread ids before decoding:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"only the id spread may shuffle:\n$plan")
  }

  test("negative sampling avoids interactions, deterministic first-k") {
    import spark.implicits._
    import graft.ext.NegSampling
    val customer = Seq(1L, 2L).toDF("c_custkey")
    val part = (1L to 50L).toDF("p_partkey")
    val orders = Seq((10L, 1L)).toDF("o_orderkey", "o_custkey")
    // customer 1 interacted with every odd part; customer 2 with none
    val lineitem = (1L to 49L by 2)
      .map(p => (10L, p)).toDF("l_orderkey", "l_partkey")
    val r1 = NegSampling.negativeSamples(customer, orders,
      lineitem, part).collect()
    val bought = (1L to 49L by 2).toSet
    val u1 = r1.filter(_.getAs[Long]("c_custkey") == 1L)
    assert(u1.nonEmpty
      && u1.forall(x => !bought(x.getAs[Long]("p_partkey"))))
    assert(r1.filter(_.getAs[Long]("c_custkey") == 2L)
      .map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(r1.forall(x => { val p = x.getAs[Long]("p_partkey")
      p >= 1L && p <= 50L }))
    // the k negatives per user are k DISTINCT items (colliding hash
    // draws dedup before the first-k rank)
    r1.groupBy(_.getAs[Long]("c_custkey")).foreach { case (_, rows) =>
      val items = rows.map(_.getAs[Long]("p_partkey"))
      assert(items.distinct.length == items.length)
    }
    // reproducible: a second run draws the identical sample
    val r2 = NegSampling.negativeSamples(customer, orders,
      lineitem, part).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("served hard negatives are a valid subset of the exact pool") {
    import graft.ext.Similarity
    val emb = Tables(spark, Sf0001).embeddings
    val path = java.nio.file.Files
      .createTempDirectory("hn_ivf").toString + "/idx"
    Similarity.writeIvfIndex(emb, path)
    val served = Similarity.hardNegativesServed(spark, path, emb)
      .collect()
    // every served row satisfies the band and cross-label contract
    served.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= Similarity.NegBandLo && c < Similarity.NegBandHi)
    }
    // cross-label contract: no served negative shares its anchor's
    // label (check against the raw table)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("label")).toMap
    served.foreach(r => assert(
      labelOf(r.getAs[Long]("vec_id")) != labelOf(r.getAs[Long]("q_id"))))
    // the served ranking must overlap the exact brute-force top-N
    // (probed cells hold part of the hard band on the fixture)
    val exactPairs = Similarity.hardNegatives(emb).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val servedPairs = served
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
    assert(servedPairs.nonEmpty
      && servedPairs.count(exactPairs.contains) > 0,
      s"served mined ${served.length} rows with zero overlap vs exact")
  }

  test("label balance: exact ppm shares and uniform deltas") {
    import spark.implicits._
    val emb = Seq((0L, 0L), (1L, 0L), (2L, 1L))
      .toDF("vec_id", "label")
    val r = graft.ext.EmbedStats.labelBalance(emb).collect()
    assert(r.map(x => (x.getAs[Long]("label"), x.getAs[Long]("n"),
      x.getAs[Long]("share_ppm"), x.getAs[Long]("uniform_delta_ppm")))
      .toSeq == Seq((0L, 2L, 666666L, 166666L),
        (1L, 1L, 333333L, -166667L)))
  }

  test("padding report: power-of-two buckets with exact waste ppm") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" ")),
      (2L, Seq.fill(17)("w").mkString(" ")),
      (3L, Seq.fill(100)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.ext.Curation.paddingReport(docs).collect()
    assert(r.map(x => (x.getAs[Long]("bucket"), x.getAs[Long]("n_docs"),
      x.getAs[Long]("padded_tokens"), x.getAs[Long]("waste_ppm")))
      .toSeq == Seq((16L, 1L, 16L, 375000L), (32L, 1L, 32L, 468750L),
        (128L, 1L, 128L, 218750L)))
  }

  test("ann recall report: full anchor coverage, sane ppm ranges") {
    import graft.ext.Similarity
    val emb = Tables(spark, Sf0001).embeddings
    val path = java.nio.file.Files
      .createTempDirectory("arr_ivf").toString + "/idx"
    Similarity.writeIvfIndex(emb, path)
    val r = Similarity.annRecallReport(spark, path, emb,
      Similarity.ivfProbesFor(Similarity.IvfCells)).collect()
    assert(r.length == Similarity.NumQueries)
    r.foreach { x =>
      assert(x.getAs[Long]("k_brute") == Similarity.TopK)
      val rec = x.getAs[Long]("recall_ppm")
      assert(rec >= 0L && rec <= 1000000L)
      val mrr = x.getAs[Long]("mrr_ppm")
      assert(mrr >= 0L && mrr <= 1000000L)
      assert(x.getAs[Long]("n_overlap") <= x.getAs[Long]("k_served"))
    }
    // the fixture index serves a useful neighborhood: mean recall > 0.5
    val mean = r.map(_.getAs[Long]("recall_ppm")).sum / r.length
    assert(mean > 500000L, s"mean recall_ppm $mean")
  }

  test("hash embeddings: unit vectors, similarity ordering, ANN composition") {
    import spark.implicits._
    val d = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon theta"),
      (2L, "zebra yak xylophone walrus vulture tapir"))
      .toDF("doc_id", "text")
    val e = graft.ext.EmbedStats.hashEmbeddings(d).collect()
      .map(r => r.getAs[Long]("doc_id")
        -> r.getSeq[Double](r.fieldIndex("embedding")).toVector).toMap
    e.values.foreach { v =>
      assert(v.length == graft.ext.EmbedStats.HashDim)
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"norm $n")
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // shared-token docs are closer than disjoint-token docs
    assert(cos(e(0L), e(1L)) > cos(e(0L), e(2L)) + 0.3)
    // the output shape composes directly with the ANN stack
    val asEmb = graft.ext.EmbedStats.hashEmbeddings(d)
      .select(col("doc_id").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .withColumn("label", lit(0L))
    val nn = graft.ext.Similarity.topKBruteForce(asEmb)
      .filter(col("q_id") === 0L && col("rank") === 1L).head()
    assert(nn.getAs[Long]("vec_id") == 1L)
  }

  test("native bow_hash_embed is bit-identical to the HOF reference") {
    val docs = Tables(spark, Sf0001).documents
    val native = graft.ext.EmbedStats.hashEmbeddings(docs).collect()
    val hof = graft.ext.EmbedStats.hashEmbeddingsHof(docs).collect()
    assert(native.length == hof.length)
    native.zip(hof).foreach { case (a, b) =>
      assert(a.getAs[Long]("doc_id") == b.getAs[Long]("doc_id"))
      val va = a.getSeq[Double](a.fieldIndex("embedding"))
      val vb = b.getSeq[Double](b.fieldIndex("embedding"))
      assert(va.length == vb.length)
      va.zip(vb).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToRawLongBits(x)
          == java.lang.Double.doubleToRawLongBits(y),
          s"doc ${a.getAs[Long]("doc_id")}: $x vs $y")
      }
    }
  }

  test("BoW near-dup catches reordered duplicates that shingles miss") {
    import spark.implicits._
    val base = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo").split(" ")
    val d = Seq(
      (0L, base.mkString(" ")),
      (1L, base.reverse.mkString(" ")), // same multiset, reversed order
      (2L, "zulu yankee xray whiskey victor uniform tango sierra " +
        "completely different words everywhere here now today ok fine"))
      .toDF("doc_id", "text")
    // identical token multiset -> identical hashed vector -> cosine 1.0
    val bow = graft.ext.Dedup.bowNearDups(d).collect()
    val pair = bow.find(r => r.getAs[Long]("vec_a") == 0L
      && r.getAs[Long]("vec_b") == 1L)
    assert(pair.isDefined, "reordered duplicate not caught by BoW")
    assert(math.abs(pair.get.getAs[Double]("cosine") - 1.0) < 1e-6)
    // the shingle-based screen is order-sensitive and misses it
    val mh = graft.ext.Dedup.minhashNearDups(d).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(!mh.contains((0L, 1L)),
      "expected the shingle screen to miss the reordered twin")
  }

  test("dedup manifest: survivors own their dropped lists, min-id policy") {
    import spark.implicits._
    // planted label table: component {1,2,3}, component {5,6}, and a
    // self-labeled singleton 9 that must NOT appear in the manifest
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L),
      (9L, 9L)).toDF("doc_id", "label")
    val m = graft.ext.Dedup.dedupManifest(
      spark.emptyDataFrame, labels = Some(labels)).collect()
    assert(m.map(x => (x.getAs[Long]("survivor"),
      x.getAs[Long]("n_dropped"),
      x.getAs[Seq[Long]]("dropped"))).toSeq
      == Seq((1L, 2L, Seq(2L, 3L)), (5L, 1L, Seq(6L))))
  }

  test("pack assignments: grouping them reproduces the pack plan exactly") {
    val docs = Tables(spark, Sf0001).documents
    val assigns = graft.ext.Curation.packAssignments(docs).collect()
    assert(assigns.length == docs.count())
    // offsets are in-budget and advance by token count within a sequence
    val budget = graft.ext.Curation.SeqBudget
    assigns.foreach { r =>
      val off = r.getAs[Long]("seq_offset")
      assert(off >= 0 && off < budget, r.toString)
    }
    // rolling the per-doc assignments up reproduces the per-sequence
    // audit bit-for-bit (the two artifacts share one window, but this
    // pins the contract against refactors separating them)
    val fromAssigns = assigns
      .groupBy(r => (r.getAs[String]("stream"), r.getAs[Long]("seq_id")))
      .map { case ((st, sq), rows) =>
        (st, sq, rows.length.toLong, rows.map(_.getAs[Long]("n_tokens")).sum,
          rows.map(_.getAs[Long]("doc_id")).min,
          rows.map(_.getAs[Long]("doc_id")).max)
      }.toSet
    val plan = graft.ext.Curation.packPlan(docs).collect()
      .map(r => (r.getAs[String]("stream"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toSet
    assert(fromAssigns == plan)
  }

  test("keep-priority: cross-source twins keep the preferred source") {
    import spark.implicits._
    // twins 1/2 span sources; priority = lexicographic source order,
    // so the src_a copy must survive regardless of doc_id order
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again x",
        "src_b"),
      (2L, "the quick brown fox jumps over the lazy dog again and again y",
        "src_a"),
      (3L, "completely different words about spark shuffles joins scans",
        "src_a"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val r = Dedup.keepPrioritySurvivors(d).collect()
      .map(x => x.getAs[Long]("doc_id")
        -> (x.getAs[Boolean]("keep"), x.getAs[String]("source"))).toMap
    assert(r(2L)._1, "preferred-source twin dropped")
    assert(!r(1L)._1, "dispreferred-source twin kept")
    assert(r(3L)._1, "singleton dropped")
    // invariant on the fixture corpus: exactly one keeper per cluster
    val docs = Tables(spark, Sf0001).documents
    val full = Dedup.keepPrioritySurvivors(docs).collect()
    full.filter(!_.isNullAt(1)).groupBy(_.getAs[Long]("cluster_id"))
      .foreach { case (c, rows) =>
        assert(rows.count(_.getAs[Boolean]("keep")) == 1, s"cluster $c")
        // the keeper carries the cluster's lexicographically least
        // (source, doc_id)
        val best = rows.map(x =>
          (x.getAs[String]("source"), x.getAs[Long]("doc_id"))).min
        val kept = rows.find(_.getAs[Boolean]("keep")).get
        assert((kept.getAs[String]("source"),
          kept.getAs[Long]("doc_id")) == best)
      }
  }

  test("epoch plan: integer water-fill respects budget, cap, quality order") {
    val docs = Tables(spark, Sf0001).documents
    val plan = graft.ext.Curation.epochPlan(docs).collect()
    assert(plan.nonEmpty)
    val tTotal = plan.map(_.getAs[Long]("n_tokens")).sum
    val budget = tTotal * 7L / 2L
    val planned = plan.map(_.getAs[Long]("planned_tokens")).sum
    val fullRounds = math.min(budget / tTotal, graft.ext.Curation.EpochCap)
    // budget never exceeded; every source gets its full rounds; no one
    // exceeds full rounds + 1 or the cap
    assert(planned <= budget, s"planned $planned > budget $budget")
    plan.foreach { r =>
      val e = r.getAs[Long]("epochs")
      assert(e >= fullRounds && e <= fullRounds + 1
        && e <= graft.ext.Curation.EpochCap, r.toString)
      assert(r.getAs[Long]("planned_tokens")
        == e * r.getAs[Long]("n_tokens"))
    }
    // extras are exactly the maximal PREFIX of the quality ordering
    // (quality desc, source asc) whose cumulative tokens fit the
    // post-full-rounds remainder
    def key(r: org.apache.spark.sql.Row) =
      (-r.getAs[Long]("quality_ppm"), r.getAs[String]("source"))
    val ordered = plan.sortBy(key)
    val flags = ordered.map(_.getAs[Long]("epochs") == fullRounds + 1)
    assert(!flags.dropWhile(identity).contains(true),
      "extra epochs are not a prefix of the quality ordering")
    val rem = budget - fullRounds * tTotal
    val nExtra = flags.takeWhile(identity).length
    val prefixToks =
      ordered.take(nExtra).map(_.getAs[Long]("n_tokens")).sum
    assert(prefixToks <= rem, "extra prefix exceeds the remainder")
    if (nExtra < ordered.length)
      assert(prefixToks
        + ordered(nExtra).getAs[Long]("n_tokens") > rem,
        "planner stopped although the next source still fit")
  }

  test("keep-best manifest: survivors ARE keepBestSurvivors' kept docs") {
    val docs = Tables(spark, Sf0001).documents
    val m = graft.ext.Dedup.dedupManifestBest(docs).collect()
    assert(m.nonEmpty, "fixture has planted near-dups; manifest empty")
    val kb = graft.ext.Dedup.keepBestSurvivors(docs).collect()
    val clusterSizes = kb.filter(!_.isNullAt(1))
      .groupBy(_.getAs[Long]("cluster_id")).view.mapValues(_.length).toMap
    // survivors of the manifest == kept docs of >=2-doc clusters
    val expectSurvivors = kb
      .filter(r => !r.isNullAt(1) && r.getAs[Boolean]("keep")
        && clusterSizes(r.getAs[Long]("cluster_id")) >= 2)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(m.map(_.getAs[Long]("survivor")).toSet == expectSurvivors)
    // each manifest row lists exactly its cluster minus the survivor,
    // and dropped docs are exactly the keep=false docs
    val dropped = m.flatMap(_.getAs[String]("dropped_ids").split(",")
      .map(_.toLong)).toSet
    val expectDropped = kb.filter(r => !r.isNullAt(1)
      && !r.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    assert(dropped == expectDropped)
    m.foreach(r => assert(r.getAs[Long]("n_dropped")
      == r.getAs[String]("dropped_ids").split(",").length.toLong))
  }

  test("priority manifest: survivors ARE keepPrioritySurvivors' kept docs") {
    val docs = Tables(spark, Sf0001).documents
    val m = graft.ext.Dedup.dedupManifestPriority(docs).collect()
    assert(m.nonEmpty)
    val kp = graft.ext.Dedup.keepPrioritySurvivors(docs).collect()
    val sizes = kp.filter(!_.isNullAt(1))
      .groupBy(_.getAs[Long]("cluster_id")).view.mapValues(_.length).toMap
    val expectSurvivors = kp
      .filter(r => !r.isNullAt(1) && r.getAs[Boolean]("keep")
        && sizes(r.getAs[Long]("cluster_id")) >= 2)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(m.map(_.getAs[Long]("survivor")).toSet == expectSurvivors)
    val dropped = m.flatMap(_.getAs[String]("dropped_ids").split(",")
      .map(_.toLong)).toSet
    assert(dropped == kp.filter(r => !r.isNullAt(1)
      && !r.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet)
  }

  test("flat manifest: string-joined dropped ids, numeric order kept") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L),
      (9L, 9L), (10L, 1L)).toDF("doc_id", "label")
    val m = graft.ext.Dedup.dedupManifestFlat(
      spark.emptyDataFrame, labels = Some(labels)).collect()
    // "10" after "3": numeric sort happens before the string join
    assert(m.map(x => (x.getAs[Long]("survivor"),
      x.getAs[Long]("n_dropped"), x.getAs[String]("dropped_ids"))).toSeq
      == Seq((1L, 3L, "2,3,10"), (5L, 1L, "6")))
  }

  test("long-form hash embeddings match posexplode of the array form") {
    import spark.implicits._
    val d = Seq((0L, "alpha beta gamma"), (1L, "delta epsilon"),
      (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val long = graft.ext.EmbedStats.hashEmbeddingsLong(d).collect()
    // NULL-text doc 2 is absent (posexplode of NULL), empty doc 3 is
    // present as an all-zeros vector
    assert(long.map(_.getAs[Long]("doc_id")).distinct.toSet
      == Set(0L, 1L, 3L))
    assert(long.length == 3 * graft.ext.EmbedStats.HashDim)
    val viaArray = graft.ext.EmbedStats.hashEmbeddings(d)
      .filter(col("embedding").isNotNull)
      .select(col("doc_id"), posexplode(col("embedding")))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos").toLong)
        -> r.getAs[Double]("col")).toMap
    long.foreach { r =>
      val k = (r.getAs[Long]("doc_id"), r.getAs[Long]("dim"))
      assert(java.lang.Double.doubleToRawLongBits(viaArray(k))
        == java.lang.Double.doubleToRawLongBits(r.getAs[Double]("value")))
    }
    // and the array form keeps the NULL-text doc as a NULL row
    val arr = graft.ext.EmbedStats.hashEmbeddings(d).collect()
    assert(arr.length == 4 && arr.count(_.isNullAt(1)) == 1)
  }

  test("tokenizer fertility: per-lang roll-up of the tokenize report") {
    val docs = Tables(spark, Sf0001).documents
    val merges = graft.ext.Bpe.trainMergesCached(docs, Sf0001)
    val fert = graft.ext.Bpe.fertilityReport(docs, merges).collect()
    assert(fert.nonEmpty)
    // exact agreement with the per-doc report rolled up by lang
    val rep = graft.ext.Bpe.tokenizeReport(docs, merges)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_words").as("w"),
        org.apache.spark.sql.functions.sum("n_bpe_tokens").as("t"))
      .collect().map(x => x.getAs[String]("lang")
        -> (x.getAs[Long]("w"), x.getAs[Long]("t"))).toMap
    fert.foreach { x =>
      val (w, t) = rep(x.getAs[String]("lang"))
      assert(x.getAs[Long]("n_words") == w)
      assert(x.getAs[Long]("n_bpe_tokens") == t)
      // merges never cross spaces: words <= bpe tokens, fertility >= 1
      assert(t >= w && x.getAs[Long]("fertility_ppm") >= 1000000L)
    }
  }

  test("filtered ANN: every hit shares its anchor's label, ranks contiguous") {
    import graft.ext.Similarity
    val emb = Tables(spark, Sf0001).embeddings
    val path = java.nio.file.Files
      .createTempDirectory("flt_ivf").toString + "/idx"
    Similarity.writeIvfIndex(emb, path)
    val r = Similarity.topKIvfFiltered(spark, path, emb,
      Similarity.ivfProbesFor(Similarity.IvfCells)).collect()
    assert(r.nonEmpty)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("label")).toMap
    r.foreach { x =>
      assert(x.getAs[Long]("label") == labelOf(x.getAs[Long]("q_id")))
      assert(x.getAs[Long]("label") == labelOf(x.getAs[Long]("vec_id")))
    }
    r.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq
        == (1L to byRank.length).toSeq)
      val cos = byRank.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // the filter is the ONLY difference vs the unfiltered served path:
    // filtered hits are exactly the same-label slice of a served run
    // with the same probes, re-ranked
    val unfiltered = Similarity.topKIvfServed(spark, path,
      Similarity.ivfProbesFor(Similarity.IvfCells)).collect()
      .filter(x => labelOf(x.getAs[Long]("vec_id"))
        == labelOf(x.getAs[Long]("q_id")))
      .map(x => (x.getAs[Long]("q_id"), x.getAs[Long]("vec_id"))).toSet
    val filtered = r
      .map(x => (x.getAs[Long]("q_id"), x.getAs[Long]("vec_id"))).toSet
    assert(unfiltered.subsetOf(filtered),
      "same-label hits of the unfiltered top-k must all appear")
  }

  test("served label-noise audit covers the exact anchor set with sane consensus") {
    import graft.ext.Similarity
    val emb = Tables(spark, Sf0001).embeddings
    val path = java.nio.file.Files
      .createTempDirectory("ln_ivf").toString + "/idx"
    Similarity.writeIvfIndex(emb, path)
    val served = Similarity.labelNoiseKnnServed(spark, path, emb).collect()
    val exact = Similarity.labelNoiseKnn(emb).collect()
    // identical anchor set and anchor labels (from the raw table)
    assert(served.map(_.getAs[Long]("q_id")).toSeq
      == exact.map(_.getAs[Long]("q_id")).toSeq)
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("label")).toMap
    served.foreach(r => assert(
      r.getAs[Long]("label") == labelOf(r.getAs[Long]("q_id"))))
    // neighborhood size: bounded by k, non-empty for every anchor
    served.foreach { r =>
      val k = r.getAs[Long]("k")
      assert(k > 0 && k <= Similarity.TopK)
      val agree = r.getAs[Long]("agree_ppm")
      assert(agree >= 0L && agree <= 1000000L)
    }
    // the served consensus must track the exact audit: suspect flags
    // agree on a majority of anchors (probing misses can flip edge
    // cases, but an index serving unrelated neighborhoods would not
    // reproduce the consensus structure)
    val exactSuspect = exact
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Boolean]("suspect")).toMap
    val agreeCnt = served.count(r =>
      exactSuspect(r.getAs[Long]("q_id")) == r.getAs[Boolean]("suspect"))
    assert(agreeCnt * 2 >= served.length,
      s"served suspect flags agree on only $agreeCnt/${served.length}")
  }

  test("label noise knn: low consensus flags, clean cluster passes") {
    import spark.implicits._
    import graft.ext.Similarity
    def v(xs: Double*): Array[Float] =
      (xs.toArray.map(_.toFloat) ++ Array.fill(4)(0.0f)).take(4)
    // anchor 0 (label 0) sits in a cluster labeled 1 → 1/5 agreement,
    // suspect; anchor 1 (label 2) sits among label-2 peers → clean
    val clusterA = Seq(
      (100L, v(1.0, 0.01), 1), (101L, v(1.0, 0.02), 1),
      (102L, v(1.0, 0.03), 1), (103L, v(1.0, 0.04), 0),
      (104L, v(1.0, 0.05), 1))
    val clusterB = Seq(
      (200L, v(0.01, 1.0), 2), (201L, v(0.02, 1.0), 2),
      (202L, v(0.03, 1.0), 2), (203L, v(0.04, 1.0), 2),
      (204L, v(0.05, 1.0), 2))
    val vecs = (Seq((0L, v(1.0), 0), (1L, v(0.0, 1.0), 2))
      ++ clusterA ++ clusterB)
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.labelNoiseKnn(vecs).collect()
      .map(x => x.getAs[Long]("q_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_agree") == 1L
      && r(0L).getAs[Long]("agree_ppm") == 200000L
      && r(0L).getAs[Boolean]("suspect"))
    assert(r(1L).getAs[Long]("n_agree") == 5L
      && !r(1L).getAs[Boolean]("suspect"))
  }

  test("embedding covariance matches hand computation; PCA finds the axis") {
    import spark.implicits._
    import graft.ext.EmbedStats
    // points spread along the (1,1,0) diagonal with a small orthogonal
    // wiggle: cov must be symmetric-PSD with dominant axis ~ (1,1,0)/√2
    val vecs = Seq(
      Array(1.0f, 1.0f, 0.1f), Array(2.0f, 2.0f, -0.1f),
      Array(3.0f, 3.0f, -0.1f), Array(4.0f, 4.0f, 0.1f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v, 0L) }
      .toDF("vec_id", "embedding", "label")
    val cov = EmbedStats.covariance(vecs)
    val rows = cov.collect().map(r =>
      (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r).toMap
    assert(rows.size == 6)  // upper triangle of d=3
    // hand values: var(x)=var(y)=1.25, cov(x,y)=1.25, var(z)=0.01
    assert(math.abs(rows((1L, 1L)).getAs[Double]("cov") - 1.25) < 1e-4)
    assert(math.abs(rows((1L, 2L)).getAs[Double]("cov") - 1.25) < 1e-4)
    assert(math.abs(rows((3L, 3L)).getAs[Double]("cov") - 0.01) < 1e-4)
    assert(math.abs(rows((1L, 3L)).getAs[Double]("cov")) < 1e-4)
    assert(rows((2L, 2L)).getAs[Double]("mean_j") == 2.5)
    val (lambda, v, explained) = EmbedStats.pcaTopComponent(cov)
    assert(math.abs(lambda - 2.5) < 1e-3)          // 2·1.25
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 1e-3
      && math.abs(v(0) - v(1)) < 1e-6 && math.abs(v(2)) < 1e-2)
    assert(explained > 0.99 * 2.5 / 2.51 && explained <= 1.0)
  }

  test("quality calibration ranks within language and keeps top quintile") {
    import spark.implicits._
    import graft.ext.TextAnalysis
    // two languages with deliberately different raw-margin scales; the
    // calibrated rank must be computed within each language
    val docs = Seq(
      (1L, "the of and is to in a the of and", "en"),
      (2L, "the the the the the the the the the the", "en"),
      (3L, "x", "en"),
      (4L, "der und ist zu das die ein der und ist", "de"),
      (5L, "q", "de"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val r = TextAnalysis.qualityCalibrated(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // ranks are per-language: each lang's worst doc sits at 0.0
    val en = Seq(1L, 2L, 3L).map(i => r(i).getAs[Double]("pct_rank"))
    assert(en.min == 0.0 && en.max == 1.0)
    assert(Seq(4L, 5L).map(i => r(i).getAs[Double]("pct_rank"))
      .sorted == Seq(0.0, 1.0))
    // bottom-quintile drop: rank 0.0 docs are dropped, rest kept
    assert(r.values.forall(x =>
      x.getAs[Boolean]("keep_calibrated")
        == (x.getAs[Double]("pct_rank") >= 0.2)))
    // tie semantics: equal margins share the min-rank percent
    val m = r.values.groupBy(x => (x.getAs[String]("lang"),
      x.getAs[Long]("margin_ppm")))
    m.values.foreach(g => assert(
      g.map(_.getAs[Double]("pct_rank")).toSet.size == 1))
  }

  test("pmi collocations rank a fixed phrase above independent pairs") {
    import spark.implicits._
    import graft.ext.TextAnalysis
    // "new york" always adjacent (PMI high); "the cat"/"the dog"
    // co-occur with a promiscuous "the" (PMI low); pairs under the
    // min-count floor must not appear.
    val docs = (Seq.fill(6)("new york") ++
      Seq.fill(5)("the cat") ++ Seq.fill(5)("the dog") ++
      Seq("rare pair"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val r = TextAnalysis.pmiCollocations(docs).collect()
    val byPair = r.map(x =>
      (x.getAs[String]("a"), x.getAs[String]("b")) -> x).toMap
    assert(!byPair.contains(("rare", "pair")))  // below min count
    val n = 34.0   // total tokens
    val bt = 17.0  // total adjacent pairs
    def pmiMicros(cab: Long, ca: Long, cb: Long): Long =
      math.floor(math.log(cab * n * n / (bt * ca * cb)) * 1e6 + 0.5).toLong
    assert(byPair(("new", "york")).getAs[Long]("pmi_micros")
      == pmiMicros(6, 6, 6))
    assert(byPair(("the", "cat")).getAs[Long]("pmi_micros")
      == pmiMicros(5, 10, 5))
    assert(byPair(("new", "york")).getAs[Long]("pmi_micros")
      > byPair(("the", "cat")).getAs[Long]("pmi_micros"))
    // deterministic ordering: pmi desc, then (a, b)
    assert(r.head.getAs[String]("a") == "new")
  }

  test("bitext margin mining accepts standout pairs, rejects hubs") {
    import spark.implicits._
    import graft.ext.Similarity
    def embs(rows: Seq[(Long, Array[Float], Int)]) =
      rows.toDF("vec_id", "embedding", "label")
    // planted pair: A-query (1,0) has a near-identical B twin while the
    // rest of B is spread out -> its cosine stands out of both
    // neighborhoods -> accepted
    val planted = embs(Seq(
      (0L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 0),
      (4L, Array(-1f, 0f), 0),
      (6L, Array(0f, -1f), 0),
      (1L, Array(1f, 0.1f), 1),
      (3L, Array(0.5f, 0.5f), 1),
      (5L, Array(-0.5f, 0.5f), 1),
      (7L, Array(0.5f, -0.5f), 1)))
    val p = Similarity.bitextMarginPairs(planted).collect()
      .map(r => r.getAs[Long]("q_id") -> r).toMap
    assert(p(0L).getAs[Long]("cand_id") == 1L)
    assert(p(0L).getAs[Boolean]("accepted"),
      s"margin=${p(0L).getAs[Long]("margin_ppm")}")
    // hub corpus: every vector points the same way, so the best
    // neighbor never stands out of its neighborhood -> margin ~ 1.0,
    // everything rejected (the hub-suppression property the plain
    // cosine threshold lacks)
    val hub = embs((0L until 8L).map(i =>
      (i, Array(1f, i * 0.001f), (i % 2).toInt)))
    val h = Similarity.bitextMarginPairs(hub).collect()
    assert(h.nonEmpty && h.forall(!_.getAs[Boolean]("accepted")),
      h.map(r => r.getAs[Long]("margin_ppm")).mkString(","))
  }

  test("incremental media screen ≡ full served screen restricted to batch pairs") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // subset-exactness is the property CorpusGraph.append's
    // append ≡ rebuild contract rests on for the media channels: the
    // batch-side banded screen against the grown index must emit
    // EXACTLY the full re-screen's pairs that touch a batch doc
    val docs = Tables(spark, Sf0001).documents
    val path = java.nio.file.Files
      .createTempDirectory("incscreen").toString
    Multimodal.writeMediaFpIndex(docs, path)
    def isBatch(c: org.apache.spark.sql.Column) =
      pmod(c, lit(10L)) === lit(7L)
    val cols = Seq("doc_a", "doc_b", "hamming", "modality")
    val inc = Multimodal.mediaNearDupPairsIncremental(spark, path,
        isBatch(_))
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val full = Multimodal.mediaNearDupPairsServed(spark, path)
      .filter(isBatch(col("doc_a")) || isBatch(col("doc_b")))
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(inc.nonEmpty, "fixture must plant batch-side media twins")
    assert(inc == full,
      s"incremental screen diverged: only-inc=${inc -- full}, " +
        s"only-full=${full -- inc}")
  }

  test("readHitPartitions: direct cell-dir read ≡ isin-filtered scan; "
      + "absent values and empty-dir edges are lossless") {
    import spark.implicits._
    import graft.streaming.BatchIndex
    val path = java.nio.file.Files.createTempDirectory("rhp").toString +
      "/data"
    // 40 cells × 25 rows, the IVF data shape (cell-partitioned)
    spark.range(1000)
      .select(col("id").as("vec_id"), (col("id") % 40).as("cell"),
        (col("id") * 3).as("payload"))
      .write.partitionBy("cell").parquet(path)
    def empty = spark.read.parquet(path).limit(0)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1))
    // probe: present cells + values no dir exists for
    val probe = Seq(3L, 17L, 38L, 99L, 1000L)
    val direct = BatchIndex.readHitPartitions(spark, path, "cell",
        probe, empty)
      .select(col("vec_id"), col("payload")).collect().map(key).toSet
    val full = spark.read.parquet(path)
      .filter(col("cell").isin(probe: _*))
      .select(col("vec_id"), col("payload")).collect().map(key).toSet
    assert(direct == full && direct.size == 75,
      s"direct=${direct.size} full=${full.size}")
    // all-absent probe and absent root: empty, no failure
    assert(BatchIndex.readHitPartitions(spark, path, "cell",
      Seq(99L), empty).count() == 0L)
    assert(BatchIndex.readHitPartitions(spark, s"$path.gone", "cell",
      Seq(1L), spark.range(0).toDF("vec_id")).count() == 0L)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
