package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Curation

/** Specs for the training-data curation operators: benchmark
  * decontamination, deterministic stratified sampling, PII scrubbing.
  * Planted micro-fixtures with hand-checkable answers plus determinism /
  * composition invariants.
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession._
  graft.functions.GraftFunctions.register(spark)

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  // ---- source mixing weights ----------------------------------------------

  test("leakage-safe split keeps near-dup cluster-mates on one side") {
    import spark.implicits._
    import graft.ext.{Curation, Dedup}
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    // {1,2,3} cluster transitively; 9 stands alone — build the per-doc
    // split directly from the same key rule the summary aggregates
    val chain = Seq(
      (1L, s"$base left left left left", "en"),
      (2L, s"$base right right right right", "en"),
      (3L, base, "en"),
      (9L, "totally unrelated text about completely other things here", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
    val labels = Dedup.clusterLabels(
      Dedup.minhashNearDups(chain).select("doc_a", "doc_b"))
    val assigned = chain.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        Curation.splitName(coalesce(col("label"), col("doc_id")))
          .as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the whole cluster shares doc 1's label -> one split for all three
    assert(assigned(1L) == assigned(2L) && assigned(2L) == assigned(3L))
    // and the summary's totals account for every doc exactly once
    val sum = Curation.leakageSafeSplitSummary(chain)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    assert(sum == 4L)
  }

  test("Luhn validates known card numbers and rejects off-by-one digits") {
    import spark.implicits._
    import graft.ext.Curation
    // textbook Luhn vectors: the classic test PANs are valid; flipping
    // the check digit must flip the verdict
    val cases = Seq(
      ("4539148803436467", true),  // standard Luhn-valid example
      ("4539148803436468", false), // check digit +1
      ("79927398713", true),       // the canonical Luhn example number
      ("79927398710", false),
      ("4111111111111111", true),  // classic test VISA
      ("4111111111111112", false))
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), Curation.luhnValid(col("s")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s) }
  }

  test("ccNumber plants Luhn-valid numbers on even ids, invalid on odd") {
    import spark.implicits._
    import graft.ext.Curation
    val r = Seq(0L, 1L, 2L, 3L, 1000L, 1001L).toDF("event_id")
      .select(col("event_id"),
        Curation.luhnValid(Curation.ccNumber(col("event_id"))).as("v"))
      .collect().map(x => (x.getLong(0), x.getBoolean(1))).toMap
    assert(r(0L) && r(2L) && r(1000L))
    assert(!r(1L) && !r(3L) && !r(1001L))
  }

  test("source mix weights: hand-computed shares and epochs") {
    import spark.implicits._
    // src0: 2 docs × 3 tokens, src2: 1 doc × 6 tokens → T = 12,
    // natural share 500000 ppm each; targets 70000/70000 (both even)
    val docs = Seq(
      (1L, "a b c", "src0"), (2L, "d e f", "src0"),
      (3L, "g h i j k l", "src2"))
      .toDF("doc_id", "text", "source")
    val r = Curation.sourceMixWeights(docs).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("natural_ppm"),
          x.getAs[Long]("epochs_ppm"))).toMap
    assert(r("src0") == (6L, 500000L, 70000L * 12 / 6))
    assert(r("src2") == (6L, 500000L, 70000L * 12 / 6))
    // an odd source gets the 30000 target
    val odd = Curation.sourceMixWeights(
        docs.withColumn("source", lit("src3"))).head()
    assert(odd.getAs[Long]("target_ppm") == 30000L)
    assert(odd.getAs[Long]("natural_ppm") == 1000000L)
    assert(odd.getAs[Long]("epochs_ppm") == 30000L) // target/1 share
  }

  test("temperature mix: tau=0.5 turns a 9:1 token split into 3:1") {
    import spark.implicits._
    // p = (0.9, 0.1); sqrt(0.9) = 3*sqrt(0.1) -> shares exactly 3/4, 1/4
    val docs = Seq(
      (1L, "t t t t t t t t t", "big"), (2L, "t", "small"))
      .toDF("doc_id", "text", "source")
    val r = Curation.temperatureMixWeights(docs, tau = 0.5).collect()
      .map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("natural_ppm"),
          x.getAs[Double]("temp_share"))).toMap
    assert(r("big") == ((9L, 900000L, 0.75)))
    assert(r("small") == ((1L, 100000L, 0.25)))
    // tau = 1 reproduces the natural shares
    val nat = Curation.temperatureMixWeights(docs, tau = 1.0).collect()
      .map(x => x.getAs[String]("source") ->
        x.getAs[Double]("temp_share")).toMap
    assert(nat("big") == 0.9 && nat("small") == 0.1)
  }

  // ---- text canonicalization ----------------------------------------------

  test("normalizeText unifies NFC forms, whitespace runs, and case") {
    import spark.implicits._
    val composed = "café"              // é as one code point
    val decomposed = "café"           // e + combining acute
    val rows = Seq(
      (1L, s"  $composed   Menu "),
      (2L, s"$decomposed\tMENU"),
      (3L, "cafe menu")) // plain ascii — different text, different hash
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
        Curation.normalizeText(col("text")).as("norm"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == out(1))                // NFC + ws + case unified
    assert(out(0) == s"$composed menu")
    assert(out(2) != out(0))
    // the native expression is a no-op (same instance semantics) on
    // already-NFC input and normalizes decomposed input to composed
    val nfc = rows.select(
      graft.functions.GraftFunctions.nfcNormalize(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(nfc(1).contains(composed) && !nfc(1).contains("́"))
  }

  // ---- decontamination ----------------------------------------------------

  // doc 0 is the benchmark (0 % 50 == 0). doc 1 copies one of its 5-gram
  // windows verbatim; doc 2 shares no 5-gram.
  private lazy val contamDocs = docsDF(Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
    (1L, "intro words then alpha beta gamma delta epsilon closing remark",
      "en"),
    (2L, "completely unrelated text about spark shuffles joins and scans",
      "en")))

  test("decontamination flags only docs sharing a shingle with the bench") {
    val r = Curation.decontaminationReport(contamDocs).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L))
    val row = r.head
    // doc 1 has 10 tokens -> 6 distinct 5-gram shingles; 2 of them
    // ("alpha..epsilon" and "beta..zeta"? no — only windows fully inside
    // the copied span) overlap the benchmark's shingles:
    //   "alpha beta gamma delta epsilon" is the one verbatim window.
    assert(row.getAs[Long]("n_grams") == 6L)
    assert(row.getAs[Long]("n_hits") == 1L)
    assert(row.getAs[Double]("contamination") == 0.166667) // round(1/6, 6)
  }

  test("benchmark docs never appear in the contamination report") {
    // benchmark doc trivially overlaps itself; report must exclude it
    val r = Curation.decontaminationReport(contamDocs)
      .filter(col("doc_id") % Curation.BenchmarkMod === 0).count()
    assert(r == 0L)
  }

  test("explicit-benchmark decontamination equals the derived-split form") {
    val viaMod = Curation.decontaminationReport(contamDocs).collect().toSeq
    val viaTables = Curation.decontaminationReportAgainst(
      contamDocs.filter(col("doc_id") % 50 =!= 0),
      contamDocs.filter(col("doc_id") % 50 === 0)).collect().toSeq
    assert(viaMod == viaTables && viaMod.nonEmpty)
  }

  test("decontamination is empty when nothing overlaps") {
    val clean = docsDF(Seq(
      (0L, "one two three four five six", "en"),
      (1L, "seven eight nine ten eleven twelve", "en")))
    assert(Curation.decontaminationReport(clean).count() == 0L)
  }

  test("bloom decontam: no false negatives, FPs measured, never missed") {
    // hand corpus: the Bloom must flag doc 1 with its exact hit counted
    val b = Curation.bloomDecontam(contamDocs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(b.contains(1L), "a true contamination can NEVER be missed")
    val (ng, nh, nt) = b(1L)
    assert(ng == 6L && nt == 1L && nh >= nt)
    // the theorem on the fixture: every exact-flagged doc appears with
    // n_true equal to the exact report's n_hits, and n_hits >= n_true
    // on every row (a Bloom has no false negatives)
    val docs = Tables(spark, Sf0001).documents
    val exact = Curation.decontaminationReport(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloom = Curation.bloomDecontam(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    for ((id, hits) <- exact) {
      assert(bloom.contains(id), s"exact-flagged $id missing from bloom")
      assert(bloom(id)._2 == hits, s"n_true must equal exact n_hits: $id")
    }
    assert(bloom.forall { case (_, (nHits, nTrue)) => nHits >= nTrue })
    // the space saving COSTS false positives — surface them
    // deterministically: one 2000-gram benchmark fills ~6k of the 32k
    // bits, so a 1-gram candidate false-positives at ~(6k/32k)^3 ≈
    // 0.6 %; 2000 disjoint-vocabulary candidates make that ~12
    // expected FPs (fixed strings — the same FPs every run)
    val benchText = (0 until 2000).map(i => s"b$i").mkString(" ")
    val candDocs = docsDF((1 to 2000).map(i =>
      (i * 50L + 1, (0 until 5).map(j => s"c${i}_$j").mkString(" "),
        "en")) :+ (0L, benchText, "en"))
    val fp = Curation.bloomDecontam(candDocs).collect()
    assert(fp.forall(_.getLong(3) == 0L),
      "disjoint vocabularies can only hit as false positives")
    assert(fp.nonEmpty, "expected measurable FP mass")
    info(s"constructed FP docs: ${fp.length} / 2000 candidates")
  }

  test("bloom gram index: retraction equals rebuild; shared grams survive") {
    // b1 and b2 SHARE the 5-gram window of `good`'s first five words;
    // b2 additionally carries a window b1 doesn't have
    val sharedHead = "alpha beta gamma delta epsilon"
    val b1 = docsDF(Seq((0L, sharedHead + " zeta eta theta", "en")))
    val b2 = docsDF(Seq((50L, sharedHead + " omicron sigma tau", "en")))
    val both = b1.unionByName(b2)
    def rows(ix: org.apache.spark.sql.DataFrame) = ix.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Curation.bloomGramIndex(both)
    // the shared window's hash refcounts 2; the rest 1
    assert(rows(full).values.toSeq.sorted.lastOption.contains(2L))
    // retraction == rebuild, row for row (the purge ≡ rebuild
    // discipline TakedownSpec pins for the serving indexes)
    val after = Curation.bloomGramRemove(full, b2)
    assert(rows(after) == rows(Curation.bloomGramIndex(b1)))
    // serving consequence: a probe containing ONLY b2's extra window
    // is readmitted after retraction; one carrying the shared window
    // still flags (b1 still owns those bits)
    val onlyB2 = docsDF(Seq( // carries b2's [delta..tau] window only
      (101L, "intro words then delta epsilon omicron sigma tau closing", "en")))
    val shared = docsDF(Seq( // carries the b1∩b2 [alpha..epsilon] window
      (102L, "intro words then alpha beta gamma delta epsilon closing", "en")))
    def flagged(corpus: org.apache.spark.sql.DataFrame,
        ix: org.apache.spark.sql.DataFrame) =
      Curation.bloomFlagged(corpus,
        Curation.bloomBitsFromIndex(ix)).count()
    assert(flagged(onlyB2, full) == 1L && flagged(shared, full) == 1L)
    assert(flagged(onlyB2, after) == 0L,
      "a gram only the retracted doc carried must stop flagging")
    assert(flagged(shared, after) == 1L,
      "a gram shared with a surviving doc must keep its bits")
    // bloomBits is definitionally the index-served form
    assert(Curation.bloomBits(both).collect().map(_.getLong(0)).toSet
      == Curation.bloomBitsFromIndex(full).collect()
        .map(_.getLong(0)).toSet)
  }

  // ---- stratified sampling ------------------------------------------------

  private lazy val corpus = {
    import spark.implicits._
    (0L until 3000L).map { i =>
      val lang = (i % 3) match {
        case 0 => "en"; case 1 => "zh"; case 2 => "de"
      }
      (i, s"doc $i body", lang)
    }.toDF("doc_id", "text", "lang")
  }

  test("stratified sample rate tracks target ppm per stratum") {
    val s = Curation.stratifiedSampleSummary(corpus).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("target_ppm"), r.getAs[Long]("n_total"),
          r.getAs[Long]("n_sampled"))).toMap
    assert(s.keySet == Set("en", "zh", "de"))
    s.foreach { case (_, (ppm, total, sampled)) =>
      val expected = total * ppm / 1000000.0
      // md5-derived hash on 1000 ids per stratum: allow 5 sigma of
      // binomial noise around the target rate
      val sigma = math.sqrt(total * (ppm / 1e6) * (1 - ppm / 1e6))
      assert(math.abs(sampled - expected) <= 5 * sigma,
        s"sampled=$sampled expected=$expected sigma=$sigma")
    }
  }

  test("sample membership is deterministic and partition-independent") {
    val a = Curation.stratifiedSample(corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(corpus.repartition(13))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("summary checksum equals the checksum of the sampled rows") {
    val sampledIds = Curation.stratifiedSample(corpus)
      .groupBy("lang").agg(sum("doc_id").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    Curation.stratifiedSampleSummary(corpus).collect().foreach { r =>
      val (s, n) = sampledIds(r.getAs[String]("lang"))
      assert(r.getAs[Long]("sampled_id_sum") == s)
      assert(r.getAs[Long]("n_sampled") == n)
    }
  }

  // ---- dataset split ---------------------------------------------------------

  test("dataset split is growth-stable and tracks the 98/1/1 fractions") {
    val big = docsDF((0L until 5000L).map(i => (i, s"doc $i", "en")))
    val small = docsDF((0L until 1000L).map(i => (i, s"doc $i", "en")))
    def assignments(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        graft.ext.Curation.splitName(col("doc_id")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bigA = assignments(big)
    // growth stability: a doc's split never changes as the corpus grows
    assignments(small).foreach { case (id, s) => assert(bigA(id) == s) }
    val counts = bigA.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 4800 && counts("train") < 4990)
    assert(counts("val") > 0 && counts("test") > 0)
    assert(counts.values.sum == 5000)
  }

  // ---- corpus drift ----------------------------------------------------------

  private def withSource(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("source", concat(lit("src"), col("doc_id") % 2))

  test("corpus drift flags moved shares and one-sided values") {
    val oldSnap = withSource(docsDF(
      (0L until 80L).map(i => (i, "txt", "en")) ++
        (80L until 100L).map(i => (i, "txt", "de"))))
    val newSnap = withSource(docsDF(
      (100L until 150L).map(i => (i, "txt", "en")) ++
        (150L until 200L).map(i => (i, "txt", "zh"))))
    val r = graft.ext.Curation.corpusDrift(oldSnap, newSnap)
      .filter(col("dim") === "lang").collect()
      .map(x => x.getAs[String]("value") ->
        (x.getAs[Long]("share_old_ppm"), x.getAs[Long]("share_new_ppm"),
          x.getAs[Boolean]("drifted"))).toMap
    assert(r("en") == (800000L, 500000L, true))   // 80% -> 50%
    assert(r("de") == (200000L, 0L, true))        // vanished
    assert(r("zh") == (0L, 500000L, true))        // appeared
  }

  test("corpus drift is quiet on identical distributions") {
    val snap = withSource(docsDF((0L until 90L).map(i =>
      (i, "txt", if (i % 3 == 0) "zh" else "en"))))
    val r = graft.ext.Curation.corpusDrift(snap, snap)
    assert(r.filter(col("drifted")).count() == 0)
    assert(r.filter(col("delta_ppm") =!= 0).count() == 0)
  }

  // ---- training mix funnel --------------------------------------------------

  test("training mix funnel: each gate drops exactly its planted doc") {
    val varied = "many different interesting words compose this reasonably " +
      "long and varied document about engines and data pipelines overall"
    val docs = docsDF(Seq(
      (1L, varied + " one", "en"),
      (2L, varied + " two", "en"),   // near-dup of 1 -> dropped by dedup
      (3L, "spam spam spam spam spam spam spam spam spam spam", "en"),
      (4L, "ok", "en"),              // 1 token -> quality gate
      (5L, "an entirely separate body of prose with no overlap to others " +
        "covering storage formats partitioning and shuffles in detail",
        "zh")))
    val r = graft.ext.Curation.trainingMix(docs).collect()
      .map(x => x.getAs[String]("lang") ->
        (x.getAs[Long]("n_raw"), x.getAs[Long]("n_dedup"),
          x.getAs[Long]("n_clean"))).toMap
    // en: 4 raw; dedup drops doc 2 (keep-lowest); repetition gate drops
    // doc 3; quality gate drops doc 4 -> 1 clean
    assert(r("en") == (4L, 3L, 1L))
    assert(r("zh") == (1L, 1L, 1L))
  }

  test("training mix sample columns agree with the standalone sampler") {
    val docs = docsDF((0L until 400L).map(i =>
      (i, s"document number $i carries several plainly distinct words " +
        s"alpha$i beta$i gamma$i delta$i", if (i % 3 == 0) "zh" else "en")))
    val mix = graft.ext.Curation.trainingMix(docs).collect()
      .map(x => x.getAs[String]("lang") ->
        (x.getAs[Long]("n_sampled"), x.getAs[Long]("sampled_id_sum"))).toMap
    // no doc is dropped by any gate here, so the funnel's sample must be
    // the stratified sampler's output exactly
    val std = graft.ext.Curation.stratifiedSample(docs)
      .groupBy("lang").agg(count(lit(1)), sum("doc_id")).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(mix == std)
  }

  // ---- sequence packing ---------------------------------------------------

  test("pack plan fills sequences in doc_id order; straddlers spill") {
    // word counts 4, 5, 6, 3 with budget 10: cum-before = 0, 4, 9, 15
    // -> seqs 0, 0, 0, 1; doc 3 straddles (cum 15 > 10), by design
    val docs = docsDF(Seq(
      (1L, "w w w w", "en"),
      (2L, "w w w w w", "en"),
      (3L, "w w w w w w", "en"),
      (4L, "w w w", "en")))
    val r = Curation.packPlan(docs, budget = 10L).collect()
      .map(x => (x.getAs[Long]("seq_id"), x.getAs[Long]("n_docs"),
        x.getAs[Long]("n_tokens"), x.getAs[Long]("first_doc"),
        x.getAs[Long]("last_doc")))
    assert(r.toSeq == Seq((0L, 3L, 15L, 1L, 3L), (1L, 1L, 3L, 4L, 4L)))
  }

  test("pack plan streams are independent and deterministic") {
    val docs = docsDF((0L until 100L).map(i =>
      (i, ("tok " * (1 + (i % 7).toInt)).trim,
        if (i % 2 == 0) "en" else "zh")))
    val a = Curation.packPlan(docs, budget = 16L).collect().toSeq
    val b = Curation.packPlan(docs.repartition(7), budget = 16L)
      .collect().toSeq
    assert(a == b && a.nonEmpty)
    val byStream = a.groupBy(_.getAs[String]("stream"))
    assert(byStream.keySet == Set("en", "zh"))
    byStream.foreach { case (stream, seqs) =>
      // packing partitions the stream: doc ranges are disjoint and
      // ordered, and no token is lost or duplicated
      seqs.sliding(2).foreach {
        case Seq(p, n) => assert(
          p.getAs[Long]("last_doc") < n.getAs[Long]("first_doc"))
        case _ =>
      }
      val langTotal = docs.filter(col("lang") === stream)
        .select(sum(size(split(col("text"), " ")))).head.getLong(0)
      assert(seqs.map(_.getAs[Long]("n_tokens")).sum == langTotal)
    }
  }

  // ---- PII scrubbing ------------------------------------------------------

  private def scrubOne(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("t").select(Curation.scrubPii(col("t"))).head.getString(0)
  }

  test("chunk plan: full coverage, exact overlap, bounded windows") {
    import spark.implicits._
    // known token counts: 1, 39, 40, 41, 72, 73, 200
    val docs = Seq(1, 39, 40, 41, 72, 73, 200).zipWithIndex.map {
      case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val plan = graft.ext.Curation.chunkPlan(docs, maxTokens = 40L,
      overlap = 8L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val tokens = Map(0L -> 1L, 1L -> 39L, 2L -> 40L, 3L -> 41L,
      4L -> 72L, 5L -> 73L, 6L -> 200L)
    // stride 32: n ≤ 40 → 1 chunk; 41..72 → 2; 73..104 → 3; 200 → 6
    assert(plan(0L).length == 1 && plan(2L).length == 1)
    assert(plan(3L).length == 2 && plan(4L).length == 2)
    assert(plan(5L).length == 3)
    assert(plan(6L).length == 6)
    for ((id, chunks) <- plan; n = tokens(id)) {
      assert(chunks.head._3 == 0L, "first chunk starts at 0")
      assert(chunks.last._4 == n, "last chunk ends at n")
      for (c <- chunks) assert(c._4 - c._3 <= 40L && c._4 - c._3 > 0L)
      for (pair <- chunks.sliding(2) if pair.length == 2) {
        val (a, b) = (pair(0), pair(1))
        assert(b._3 == a._3 + 32L, "starts advance by the stride")
        assert(a._4 - b._3 == 8L || a._4 < b._3 + 8L,
          "adjacent chunks share the overlap (less only at the tail)")
      }
    }
    // production default: a 55-token doc is a single window
    assert(graft.ext.Curation.chunkPlan(docs).filter(col("doc_id") === 6)
      .count() == 1)
    // materialized chunks: with overlap 0 the chunk texts reassemble the
    // document exactly; with overlap each chunk stays within the window
    val distinct = (0 until 200).map(i => s"t$i").mkString(" ")
    val one = Seq((0L, distinct)).toDF("doc_id", "text")
    val noOverlap = graft.ext.Curation.chunkedDocuments(one, 40L, 0L)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    assert(noOverlap.mkString(" ") == distinct)
    val withOverlap = graft.ext.Curation.chunkedDocuments(one, 40L, 8L)
      .orderBy("chunk_idx").collect().map(_.getString(2))
    assert(withOverlap.forall(_.split(" ").length <= 40))
    assert(withOverlap.head.startsWith("t0 ") &&
      withOverlap.last.endsWith(" t199"))
    // chunk 1 starts at token 32 (stride) and repeats the 8-token tail
    assert(withOverlap(1).startsWith("t32 "))
  }

  test("scrub redacts all four PII classes") {
    assert(scrubOne("mail a.b+c@ex-ample.co.uk here") == "mail <EMAIL> here")
    assert(scrubOne("from 192.168.0.1 port") == "from <IP> port")
    assert(scrubOne("ssn 123-45-6789.") == "ssn <SSN>.")
    assert(scrubOne("call 555-123-4567 now") == "call <PHONE> now")
    assert(scrubOne("a@b.io at 10.0.0.1 ssn 111-22-3333 tel 212-555-0000")
      == "<EMAIL> at <IP> ssn <SSN> tel <PHONE>")
  }

  test("scrub ordering: SSN beats phone on digit-dash shapes; email wins") {
    // 3-2-4 digits is an SSN even though a phone scan could half-match
    assert(scrubOne("id 987-65-4321") == "id <SSN>")
    // an email whose domain has digit labels must not leave an IP behind
    assert(scrubOne("x 1.2.3.4@example.com y") == "x <EMAIL> y")
  }

  test("scrub is idempotent and count-consistent") {
    import spark.implicits._
    val msgs = Seq(
      "a@b.co 1.2.3.4 123-45-6789 555-867-5309",
      "no pii here at all",
      "two mails x@y.de z@w.fr and 8.8.8.8").toDF("t")
    val once = msgs.select(Curation.scrubPii(col("t")).as("t"))
    val twice = once.select(Curation.scrubPii(col("t")).as("t"))
    assert(once.collect().toSeq == twice.collect().toSeq)
    val counts = msgs.select(Curation.piiCounts(col("t")): _*).collect()
    assert(counts(0).toSeq == Seq(1L, 1L, 1L, 1L))
    assert(counts(1).toSeq == Seq(0L, 0L, 0L, 0L))
    assert(counts(2).toSeq == Seq(2L, 1L, 0L, 0L))
  }

  test("piiScrubReport finds the planted PII in every synthesized message") {
    val ce = CustomerEvents.synth(
      Tables(spark, "/root/testdata/sf0.001").events)
    val r = Curation.piiScrubReport(ce)
    // every message carries exactly one IP, one phone, one SSN; the email
    // count follows the generator's null/invalid-email anomalies
    val bad = r.filter(col("n_ip") =!= 1 || col("n_phone") =!= 1 ||
      col("n_ssn") =!= 1 || col("n_email") > 1).count()
    assert(bad == 0L)
    assert(r.filter(col("n_email") === 0).count() > 0, "anomaly emails flow")
    // scrubbed text never retains a raw PII shape
    val msg = Curation.scrubPii(Curation.supportMessage(ce))
    val leak = ce.select(msg.as("m"))
      .filter(col("m").rlike(Curation.Ipv4Re) ||
        col("m").rlike(Curation.SsnRe) || col("m").rlike(Curation.PhoneRe) ||
        col("m").rlike(Curation.EmailRe)).count()
    assert(leak == 0L)
  }

  test("curriculum quartiles partition the corpus with ordered margins") {
    val docs = Tables(spark, Sf0001).documents
    val n = docs.count()
    val r = Curation.curriculumPlan(docs).collect()
    assert(r.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(r.map(_.getAs[Long]("n_docs")).sum == n)
    // quartiles are within interpolation slack of n/4 each
    r.foreach { b =>
      assert(math.abs(b.getAs[Long]("n_docs") - n / 4) <= 3,
        s"bucket ${b.getAs[Long]("bucket")}: ${b.getAs[Long]("n_docs")}")
    }
    // margin ranges are disjoint and ascending across buckets
    val ranges = r.map(b => (b.getAs[Long]("margin_min"),
      b.getAs[Long]("margin_max")))
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping buckets: $hi vs $lo")
    }
  }

  test("dataset card ratios agree with their standalone parts") {
    val docs = Tables(spark, Sf0001).documents
    val card = Curation.datasetCard(docs).head()
    assert(card.getAs[Long]("n_docs") == docs.count())
    val uniq = docs.select(md5(col("text"))).distinct().count()
    assert(card.getAs[Long]("n_unique") == uniq)
    assert(card.getAs[Long]("dup_ppm") ==
      (card.getAs[Long]("n_docs") - uniq) * 1000000L
        / card.getAs[Long]("n_docs"))
    val keep = graft.ext.TextAnalysis.qualityClassifier(docs)
      .filter(col("keep")).count()
    assert(card.getAs[Long]("keep_ppm") ==
      keep * 1000000L / card.getAs[Long]("n_docs"))
  }

  test("corpusDiff classifies added/removed/changed/unchanged by content") {
    import spark.implicits._
    val oldSnap = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val newSnap = Seq((2L, "two CHANGED"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val r = Curation.corpusDiff(oldSnap, newSnap).collect()
      .map(x => x.getString(0) ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("id_sum"))).toMap
    assert(r == Map(
      "added" -> (1L, 4L), "removed" -> (1L, 1L),
      "changed" -> (1L, 2L), "unchanged" -> (1L, 3L)))
  }

  test("dsirWeights ranks target-like documents above off-target ones") {
    // doc 1 is the target slice; doc 2 shares its bigram, doc 3 doesn't
    val docs = docsDF(Seq(
      (1L, "aa bb aa bb", "en"),
      (2L, "aa bb", "xx"),
      (3L, "cc dd cc dd", "xx")))
    val r = Curation.dsirWeights(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_feats"), x.getAs[Double]("dsir_weight"))).toMap
    assert(r(1L)._1 == 3L && r(2L)._1 == 1L && r(3L)._1 == 3L)
    // the doc built from target-supported features must outscore the one
    // whose features never occur in the target slice
    assert(r(2L)._2 > r(3L)._2)
    assert(r(1L)._2 > r(3L)._2)
  }

  test("semanticDecontam flags only corpus vectors near a benchmark item") {
    import spark.implicits._
    val emb = Seq(
      // benchmark side (vec_id < 20)
      (0L, 0, Array(1f, 0f, 0f, 0f)),
      (1L, 0, Array(0.9f, 0.1f, 0f, 0f)),
      // corpus: exact copy of bench 0, exact copy of bench 1, orthogonal
      (20L, 1, Array(1f, 0f, 0f, 0f)),
      (21L, 1, Array(0.9f, 0.1f, 0f, 0f)),
      (22L, 1, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val r = Curation.semanticDecontam(emb).orderBy("vec_id").collect()
      .map(x => (x.getAs[Long]("vec_id"), x.getAs[Long]("bench_id"),
        x.getAs[Double]("cosine")))
    // 22 is orthogonal to both benchmark vectors -> not flagged; the
    // flagged rows carry their CLOSEST benchmark item
    assert(r.map(_._1).toSeq == Seq(20L, 21L))
    assert(r(0)._2 == 0L && r(0)._3 == 1.0)
    assert(r(1)._2 == 1L && r(1)._3 == 1.0)
  }

  test("exact-k sample: stable membership, k rows, top-k plan (no global sort)") {
    import spark.implicits._
    val docs = (0L until 500L).toDF("doc_id")
    val s1 = Curation.sampleExactK(docs, k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 50)
    // growth stability: doubling the corpus only displaces members at
    // the k boundary — survivors of the old corpus that remain in the
    // new sample keep their membership (hash-determined, not positional)
    val s2 = Curation.sampleExactK((0L until 1000L).toDF("doc_id"), k = 50)
      .collect().map(_.getLong(0)).toSet
    assert((s2 -- s1).forall(_ >= 500L)) // only NEW docs enter
    assert((s1 -- s2).size == (s2 -- s1).size) // one-for-one displacement
    assert((s2 & s1).nonEmpty)
    // plan: distributed top-k merge, never a range-partitioned sort
    val plan = Curation.sampleExactK(docs, k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("vocab growth: hand-built corpus with a known first-appearance curve") {
    import spark.implicits._
    // 4 docs, 2 buckets: types a,b,c appear in bucket 0; d only in 1
    val docs = Seq(
      (0L, "a b a"), (1L, "b c"), (2L, "a d"), (3L, "d d b"))
      .toDF("doc_id", "text")
    val r = Curation.vocabGrowth(docs, buckets = 2).collect()
    assert(r.map(_.getAs[Long]("bucket")).toSeq == Seq(0L, 1L))
    assert(r.map(_.getAs[Long]("n_tokens")).toSeq == Seq(5L, 5L))
    assert(r.map(_.getAs[Long]("n_new_types")).toSeq == Seq(3L, 1L))
    assert(r.map(_.getAs[Long]("cum_tokens")).toSeq == Seq(5L, 10L))
    assert(r.map(_.getAs[Long]("cum_types")).toSeq == Seq(3L, 4L))
  }

  test("fuzzy decontam flags a light benchmark rewrite exact overlap misses") {
    import spark.implicits._
    val benchText = (1 to 40).map(i => s"w$i").mkString(" ")
    // one word changed: 5 of 36 shingles perturbed -> set Jaccard
    // 31/41 ~ 0.76 clears the 0.5 threshold; exact overlap alone would
    // report partial contamination, fuzzy names the benchmark DOC
    val rewrite = (1 to 40).map(i => if (i == 38) "zz" else s"w$i")
      .mkString(" ")
    val far = (1 to 40).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (0L, benchText),  // benchmark (doc_id % 50 == 0)
      (1L, rewrite),    // near-dup of the benchmark -> must flag
      (2L, far))        // unrelated -> must not flag
      .toDF("doc_id", "text")
    val r = Curation.fuzzyDecontam(docs).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(r.head.getAs[Long]("bench_id") == 0L)
    assert(r.head.getAs[Double]("jaccard") >= graft.ext.Dedup.JaccardThreshold
      && r.head.getAs[Double]("jaccard") < 1.0)
  }

  test("source cap keeps the longest cap docs per source, pushed as a group limit") {
    import spark.implicits._
    // src a: 4 docs, cap 2 must keep the two longest; tie at 30 chars
    // broken by doc_id; src b: under the cap, everything survives
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 20L),
      (5L, "b", 5L))
      .toDF("doc_id", "source", "n_chars")
    val kept = Curation.sourceCap(docs, cap = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 5L))
    // the rank-filter must compile to a WindowGroupLimit (partial
    // per-partition top-k BEFORE the shuffle) — the 100 TB shape
    val plan = Curation.sourceCap(docs, cap = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)

    val sum = Curation.sourceCapSummary(docs, cap = 2).collect()
    val bySrc = sum.map(r => r.getAs[String]("source") -> r).toMap
    assert(bySrc("a").getAs[Long]("n_kept") == 2L
      && bySrc("a").getAs[Long]("n_dropped") == 2L
      && bySrc("a").getAs[Long]("kept_id_sum") == 5L
      && bySrc("a").getAs[Long]("min_kept_chars") == 30L)
    assert(bySrc("b").getAs[Long]("n_kept") == 1L
      && bySrc("b").getAs[Long]("n_dropped") == 0L)
  }

  test("weighted k-sample favors heavy docs, deterministic, top-k plan") {
    import spark.implicits._
    // 200 light docs (10 chars) + 200 heavy (1000 chars): a weighted
    // 40-sample must lean heavily toward the heavy half
    val docs = (0L until 400L).map(i =>
        (i, if (i < 200) 10L else 1000L))
      .toDF("doc_id", "n_chars")
    val s1 = Curation.weightedSampleK(docs, k = 40).collect()
    assert(s1.length == 40)
    val heavy = s1.count(_.getAs[Long]("n_chars") == 1000L)
    assert(heavy > 30, s"expected heavy-doc dominance, got $heavy/40")
    // deterministic: same membership on re-run
    val s2 = Curation.weightedSampleK(docs, k = 40)
      .collect().map(_.getLong(0)).toSet
    assert(s2 == s1.map(_.getLong(0)).toSet)
    // a doc whose weight dwarfs everything is effectively certain:
    // ln(u)/w quantizes to the maximal key 0
    val withGiant = docs.union(Seq((9999L, 100000000L))
      .toDF("doc_id", "n_chars"))
    assert(Curation.weightedSampleK(withGiant, k = 40)
      .collect().exists(_.getLong(0) == 9999L))
    // per-partition top-k + driver merge, no global range sort
    val plan = Curation.weightedSampleK(docs, k = 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("boilerplate: source-scoped template grams found and scrubbed") {
    import spark.implicits._
    import graft.ext.Boilerplate
    // source a: 4 of 5 docs open with the same 3-token template ("terms
    // of service" -> bigrams "terms of" + "of service" hit df 4/5);
    // source b: same template text exists in only 1 of 4 docs, below
    // both the 20% ppm floor? (1/4 = 25% >= 20% but df 1 < minDf 3) —
    // the absolute floor keeps tiny overlaps out
    val tpl = "terms of service"
    val docs = Seq(
      (1L, s"$tpl alpha beta gamma", "a"),
      (2L, s"$tpl delta epsilon zeta", "a"),
      (3L, s"$tpl eta theta iota", "a"),
      (4L, s"$tpl kappa lambda mu", "a"),
      (5L, "nu xi omicron pi rho sigma", "a"),
      (10L, s"$tpl tau upsilon phi", "b"),
      (11L, "chi psi omega one two three", "b"),
      (12L, "four five six seven eight nine", "b"),
      (13L, "ten eleven twelve thirteen fourteen fifteen", "b"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val rep = Boilerplate.report(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // exactly the two template bigrams clear df>=3 AND >=20% in a
    assert(rep("a").getAs[Long]("n_template_grams") == 2L)
    assert(rep("a").getAs[Long]("max_df") == 4L)
    assert(rep("b").getAs[Long]("n_template_grams") == 0L)
    val scrub = Boilerplate.scrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // docs 1-4: bigrams at pos 0 and 1 merge into one [0,2] island ->
    // 3 tokens removed of 6; doc 5 and all of source b untouched
    (1L to 4L).foreach { id =>
      assert(scrub(id).getAs[Long]("tokens_removed") == 3L, id)
      assert(scrub(id).getAs[Long]("tokens_kept") == 3L, id)
    }
    assert(scrub(5L).getAs[Long]("tokens_removed") == 0L)
    assert(scrub(10L).getAs[Long]("tokens_removed") == 0L)
    // scrub is idempotent in spirit: a corpus with no template grams
    // reports zero removals everywhere
    val clean = docs.filter(col("source") === "b")
    assert(Boilerplate.scrub(clean).agg(sum("tokens_removed"))
      .head().getLong(0) == 0L)
  }

  test("RunCuration full funnel: artifacts land, counts monotone, rerun deterministic") {
    val out = java.nio.file.Files
      .createTempDirectory("curation_run").toString
    val s1 = RunCuration.run(spark, Sf0001, out)
    // the funnel only ever removes documents
    assert(s1.raw >= s1.gated && s1.gated >= s1.deduped
      && s1.deduped >= s1.sampled && s1.sampled > 0)
    // every audit artifact landed non-empty, corpus split-partitioned
    for (a <- Seq("corpus", "quality_report", "split_summary",
        "pack_plan", "bpe_merges"))
      assert(spark.read.parquet(s"$out/$a").count() > 0, a)
    assert(spark.read.parquet(s"$out/corpus").columns.contains("split"))
    // hash-derived gates + deterministic dedup: a rerun is bit-stable
    val s2 = RunCuration.run(spark, Sf0001, out)
    assert(s1.copy(shuffleWriteBytes = 0L)
      == s2.copy(shuffleWriteBytes = 0L))
    // the corpus never reshuffles: the run's total shuffle-write volume
    // is derived-statistics-sized (bands/report rows), not corpus-sized
    val corpusBytes = new java.io.File(Sf0001, "documents.parquet").length
    assert(s1.shuffleWriteBytes < corpusBytes,
      s"funnel shuffled ${s1.shuffleWriteBytes}B >= corpus $corpusBytes B")
  }
}
