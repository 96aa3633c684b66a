package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, Search, Similarity, Takedown}

/** Takedown propagation: purging a doc set from every persisted
  * serving artifact is (a) complete — nothing serves a purged id,
  * (b) equivalent to a rebuild from the purged corpus, (c) physically
  * pruned — untouched partitions keep their exact files, and
  * (d) rerunnable to a no-op.
  */
class TakedownSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables(spark, Sf0001).documents
  private lazy val emb = Tables(spark, Sf0001).embeddings

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def listFiles(dir: String): Set[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).map(_.map(_.getName).toSet).getOrElse(Set.empty)
  }

  test("IVF index purge: complete, pruned, idempotent") {
    val path = tmpDir("tdivf")
    Similarity.writeIvfIndex(emb, path)
    val dataPath = s"$path/data"
    val before = spark.read.parquet(dataPath)
    val ids = emb.filter(col("vec_id") % 13 === 5
        && col("vec_id") >= Similarity.NumQueries) // keep query anchors
      .select(col("vec_id"))
    val nIds = ids.count()
    val beforeIds = before.select("vec_id").collect()
      .map(_.getLong(0)).toSet
    // an unaffected cell partition must keep its exact files
    val idSet = ids.collect().map(_.getLong(0)).toSet
    val untouchedCell = before.groupBy("cell")
      .agg(max(when(col("vec_id").isin(idSet.toSeq: _*), 1)
        .otherwise(0)).as("hit"))
      .filter(col("hit") === 0).select("cell").head()
      .get(0).toString.toLong // partition col reads back as INT
    val untouchedDir = s"$dataPath/cell=$untouchedCell/batch_id=0"
    val filesBefore = listFiles(untouchedDir)
    assert(filesBefore.nonEmpty)

    val stats = Takedown.purgeIndex(spark, dataPath, "vec_id", ids,
      Seq("cell", "batch_id"))
    assert(stats.rowsRemoved == nIds)
    assert(stats.partsRewritten + stats.partsDeleted <= stats.partsTotal)
    val after = spark.read.parquet(dataPath)
    assert(after.select("vec_id").collect().map(_.getLong(0)).toSet
      == beforeIds -- idSet)
    assert(Takedown.leftoverCount(after, ids, "vec_id") == 0L)
    assert(listFiles(untouchedDir) == filesBefore,
      "unaffected partition must not be rewritten")
    // serving the purged index returns no purged id
    val served = Similarity.topKIvfServed(spark, path,
      Similarity.ivfProbesFor(Similarity.IvfCells))
    assert(served.filter(col("vec_id").isin(idSet.toSeq: _*)).count()
      == 0L, "served top-k must never return a purged vector")
    // rerun converges to a no-op
    val again = Takedown.purgeIndex(spark, dataPath, "vec_id", ids,
      Seq("cell", "batch_id"))
    assert(again == Takedown.PurgeStats(0L, stats.partsTotal
      - stats.partsDeleted, 0L, 0L))
  }

  test("IVF purge deletes a fully-emptied partition directory") {
    val path = tmpDir("tdivffull")
    Similarity.writeIvfIndex(emb, path)
    val dataPath = s"$path/data"
    val before = spark.read.parquet(dataPath)
    // purge EVERY vector of one cell -> its dir must vanish
    val victim = before.groupBy("cell").count()
      .orderBy("count", "cell").head()
      .get(0).toString.toLong // partition col reads back as INT
    val ids = before.filter(col("cell") === victim).select("vec_id")
    val nOthers = before.filter(col("cell") =!= victim).count()
    val stats = Takedown.purgeIndex(spark, dataPath, "vec_id", ids,
      Seq("cell", "batch_id"))
    assert(stats.partsDeleted >= 1L)
    assert(!new java.io.File(s"$dataPath/cell=$victim").exists(),
      "fully-purged partition dir must be deleted, not left stale")
    val after = spark.read.parquet(dataPath)
    assert(after.count() == nOthers)
    assert(after.filter(col("cell") === victim).count() == 0L)
  }

  test("postings + sidecar purge: served BM25 ≡ in-flight on the purged corpus") {
    val root = tmpDir("tdpost")
    Search.writeSearchIndex(docs, root)
    val ids = Takedown.takedownSet(docs)
    val idSet = ids.collect().map(_.getLong(0)).toSet
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("rank", "doc_id", "score", "n_terms_hit")
      .orderBy("rank").collect().toSeq
    val preServed = rows(Search.bm25Served(spark, root,
      SparkEntry.SearchTerms))

    val stats = Takedown.purgeIndex(spark, s"$root/postings", "doc_id",
      ids, Seq("bucket", "batch_id"))
    assert(stats.rowsRemoved > 0L)
    val dlStats = Takedown.purgeIndex(spark, s"$root/doclen", "doc_id",
      ids, Seq("batch_id"))
    assert(dlStats.rowsRemoved == ids.count())
    assert(Takedown.leftoverCount(
      spark.read.parquet(s"$root/postings"), ids, "doc_id") == 0L)
    // purge ≡ rebuild: serving the purged index equals the in-flight
    // ranking over the purged corpus (df/N/avgdl all re-derive), and
    // differs from the pre-purge ranking if any takedown doc scored
    val purgedDocs = Takedown.purged(docs, ids, "doc_id")
    val served = rows(Search.bm25Served(spark, root,
      SparkEntry.SearchTerms))
    assert(served == rows(
      Search.bm25TopDocs(purgedDocs, SparkEntry.SearchTerms)))
    assert(served.forall(r => !idSet.contains(r.getLong(1))))
    if (preServed.exists(r => idSet.contains(r.getLong(1))))
      assert(served != preServed)
  }

  test("band-index sidecar purge readmits a takedown twin") {
    val path = tmpDir("tdband")
    Dedup.writeBandIndex(docs, path)
    val ids = Takedown.takedownSet(docs)
    val nBefore = spark.read.parquet(path).count()
    val removed = Takedown.purgeParquet(spark, path, "doc_id", ids)
    assert(removed > 0L)
    val bands = spark.read.parquet(path)
    assert(bands.count() == nBefore - removed)
    assert(Takedown.leftoverCount(bands, ids, "doc_id") == 0L)
    // right-to-be-forgotten implies READMISSION: a new doc with a
    // purged doc's exact text must no longer collide with it in the
    // band index (the screen has genuinely forgotten the content)
    val ghost = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("text")).head()
    val twin = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(java.lang.Long.valueOf(9000000L),
        ghost.getString(1))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val purgedDocs = Takedown.purged(docs, ids, "doc_id")
    val hits = Dedup.incrementalNearDups(purgedDocs, twin, Some(bands))
    assert(!hits.collect()
        .exists(_.getAs[Long]("index_doc") == ghost.getLong(0)),
      "purged doc must not resurface as a dedup match")
  }

  test("sidecar purge survives a takedown that covers every row") {
    import spark.implicits._
    val path = tmpDir("tdall") + "/dl"
    Seq((1L, 5L), (2L, 9L)).toDF("doc_id", "dl")
      .write.parquet(path)
    val ids = Seq(1L, 2L).toDF("doc_id")
    assert(Takedown.purgeParquet(spark, path, "doc_id", ids) == 2L)
    // the live path is a valid (empty) table for schema-declared readers
    assert(spark.read.schema("doc_id BIGINT, dl BIGINT").parquet(path)
      .count() == 0L)
    // and no stage dirs leak
    assert(!new java.io.File(path + ".purging").exists())
    assert(!new java.io.File(path + ".pre-purge").exists())
    // a RE-RUN over the emptied table converges to 0, not a crash
    assert(Takedown.purgeParquet(spark, path, "doc_id", ids) == 0L)
  }

  test("sidecar purge recovers both crash windows of the rename swap") {
    import spark.implicits._
    val ids = Seq(1L).toDF("doc_id")
    def freshTable(): String = {
      val p = tmpDir("tdcrash") + "/dl"
      Seq((1L, 5L), (2L, 9L)).toDF("doc_id", "dl").write.parquet(p)
      p
    }
    // window 1: death BETWEEN the renames — only the aside copy exists.
    // The re-run must restore it and complete the purge.
    val p1 = freshTable()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p1), spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(p1),
      new org.apache.hadoop.fs.Path(p1 + ".pre-purge"))
    assert(Takedown.purgeParquet(spark, p1, "doc_id", ids) == 1L)
    assert(spark.read.parquet(p1).select("doc_id").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    assert(!new java.io.File(p1 + ".pre-purge").exists())
    // window 2: death AFTER the promote but before the aside delete —
    // the stale snapshot still holds every taken-down row. The re-run
    // (even a no-op one) must remove it: takedown is not complete
    // while a readable pre-purge copy exists.
    val p2 = freshTable()
    assert(Takedown.purgeParquet(spark, p2, "doc_id", ids) == 1L)
    val stale = new org.apache.hadoop.fs.Path(p2 + ".pre-purge")
    fs.mkdirs(stale)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(p2), fs, stale, false, false,
      spark.sparkContext.hadoopConfiguration)
    assert(Takedown.purgeParquet(spark, p2, "doc_id", ids) == 0L)
    assert(!new java.io.File(p2 + ".pre-purge").exists(),
      "converged re-run must remove the stale pre-purge snapshot")
    // a genuinely MISSING path is a caller error, not convergence
    intercept[Exception] {
      Takedown.purgeParquet(spark, p2 + "_nope", "doc_id", ids)
    }
    ()
  }

  test("propagate fails fast on a missing artifact path") {
    import spark.implicits._
    val ids = Seq(1L).toDF("doc_id")
    val e = intercept[IllegalArgumentException] {
      Takedown.propagate(spark, ids, Seq(
        Takedown.FlatTable("ghost", "/tmp/graft_no_such_artifact",
          "doc_id")))
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("propagate: one call purges the whole artifact set to leftover 0") {
    import spark.implicits._
    val root = tmpDir("tdprop")
    Similarity.writeIvfIndex(emb, s"$root/ivf")
    Search.writeSearchIndex(docs, s"$root/search")
    Dedup.writeBandIndex(docs, s"$root/bands")
    // the doc set maps 1:1 onto vec ids in the fixtures
    val ids = Takedown.takedownSet(docs)
      .filter(col("doc_id") >= Similarity.NumQueries) // keep anchors
    val out = Takedown.propagate(spark, ids, Seq(
      Takedown.PartitionedIndex("ivf", s"$root/ivf/data", "vec_id",
        Seq("cell", "batch_id")),
      Takedown.PartitionedIndex("postings", s"$root/search/postings",
        "doc_id", Seq("bucket", "batch_id")),
      Takedown.PartitionedIndex("doc_lengths", s"$root/search/doclen",
        "doc_id", Seq("batch_id")),
      Takedown.FlatTable("band_index", s"$root/bands", "doc_id")))
    assert(out.map(_.artifact)
      == Seq("ivf", "postings", "doc_lengths", "band_index"))
    out.foreach { a =>
      assert(a.rowsRemoved > 0L, s"${a.artifact}: nothing purged")
      assert(a.leftover == 0L, s"${a.artifact}: takedown incomplete")
    }
    // re-propagate converges to an all-zero no-op
    val again = Takedown.propagate(spark, ids, Seq(
      Takedown.PartitionedIndex("ivf", s"$root/ivf/data", "vec_id",
        Seq("cell", "batch_id")),
      Takedown.PartitionedIndex("doc_lengths", s"$root/search/doclen",
        "doc_id", Seq("batch_id"))))
    assert(again.forall(a => a.rowsRemoved == 0L && a.leftover == 0L))
  }

  test("media fingerprint index purge: pruned, complete, served equals rebuild") {
    import graft.ext.Multimodal
    val path = tmpDir("tdmediafp")
    Multimodal.writeMediaFpIndex(docs, path)
    // purge a SMALL id set so partition pruning is observable: ids in
    // one doc_id bucket → ≤ 3 of the 3·16 partitions rewritten
    val hitIds = docs.select("doc_id")
      .filter(pmod(col("doc_id"), lit(Multimodal.MediaFpBuckets))
        === lit(5L))
      .limit(2).collect().map(_.getLong(0)).toSeq
    import spark.implicits._
    val ids = hitIds.toDF("doc_id")
    // pre-purge ground truth for the sidecar's removal accounting
    val expectedBandRows = spark.read
      .schema(Multimodal.MediaBandSchema).parquet(s"$path/bands")
      .join(ids, Seq("doc_id"), "left_semi").count()
    val untouched = Multimodal.MediaFpModalities.flatMap { m =>
      (0L until Multimodal.MediaFpBuckets).filter(_ != 5L)
        .map(b => s"$path/data/modality=$m/bucket=$b/batch_id=0")
    }.map(d => d -> listFiles(d)).toMap
    val out = Takedown.propagate(spark, ids,
      Multimodal.mediaFpTakedownArtifacts(spark, path))
    val dataOut = out.find(_.artifact == s"mediafp:$path").get
    assert(dataOut.rowsRemoved == 3L * hitIds.size,
      "each id holds one row per modality")
    assert(out.forall(_.leftover == 0L), out.toString)
    assert(dataOut.partsRewritten == 3L,
      "only the hit bucket's three modality partitions rewrite")
    // the band sidecar purges alongside: 4 bands per DECODED
    // (modality, id) fingerprint — undecodable rows never had bands
    val bandsOut = out.find(_.artifact == s"mediafp_bands:$path").get
    assert(bandsOut.rowsRemoved == expectedBandRows, bandsOut.toString)
    // physically pruned: every untouched partition keeps its exact files
    untouched.foreach { case (d, files) =>
      assert(listFiles(d) == files, s"untouched partition rewritten: $d")
    }
    // served-after-purge ≡ screens over an index rebuilt from the
    // purged corpus (the takedown contract: no trace in any answer)
    val rebuilt = tmpDir("tdmediafp2")
    Multimodal.writeMediaFpIndex(
      Takedown.purged(docs, ids, "doc_id"), rebuilt)
    for (m <- Multimodal.MediaFpModalities) {
      val served = Multimodal.mediaNearDupsServed(spark, path, m)
        .collect().map(_.toSeq).toSeq
      val ref = Multimodal.mediaNearDupsServed(spark, rebuilt, m)
        .collect().map(_.toSeq).toSeq
      assert(served == ref, s"purged index serves stale $m answers")
    }
  }

  test("HLL aggregate takedown: stale audit catches folded users; day-rebuild purges") {
    import spark.implicits._
    import graft.ext.SketchIndex
    def ts(day: Long, i: Long) =
      new java.sql.Timestamp(day * 86400000L + i * 1000L)
    // day 100: mixed users; day 101: ONLY the takedown user (the
    // partition must be DELETED, not rebuilt empty); day 102: untouched
    val events = Seq(
      (ts(100, 1), 1L, "view"), (ts(100, 2), 7L, "view"),
      (ts(100, 3), 2L, "purchase"), (ts(100, 4), 7L, "purchase"),
      (ts(101, 1), 7L, "view"), (ts(101, 2), 7L, "error"),
      (ts(102, 1), 3L, "view"), (ts(102, 2), 4L, "view"))
      .toDF("ts", "user_id", "event_type")
    val path = tmpDir("tdhll")
    SketchIndex.writeHllIndex(events, path)
    val ids = Seq(7L).toDF("user_id")
    // the audit must catch the stale aggregates BEFORE the purge — a
    // row-level leftover count is blind here (no index row carries
    // user 7; the user is folded into the sketch), which is exactly
    // the gap this audit closes
    val staleBefore = Takedown.hllStaleDays(spark, path, events, ids)
      .collect()
    assert(staleBefore.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
      == Set(100L, 101L),
      s"audit must flag every day folding user 7: ${staleBefore.mkString(",")}")
    val untouchedFiles = listFiles(s"$path/day=102")
    val out = Takedown.purgeHllIndex(spark, path, events, ids)
    assert(out.affectedDays == 2L && out.daysRebuilt == 1L
      && out.daysDeleted == 1L && out.staleBefore == 2L
      && out.staleAfter == 0L, out.toString)
    // the all-takedown day is GONE; the mixed day serves the purged
    // corpus's exact answer; the untouched day kept its exact files
    assert(!new java.io.File(s"$path/day=101").exists(),
      "a day left with no survivors must be deleted, not rebuilt empty")
    assert(listFiles(s"$path/day=102") == untouchedFiles)
    val served = SketchIndex.distinctUsersOverRange(spark, path, 100L, 102L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(served.keySet == Set("view", "purchase"),
      s"user 7's error-only type must vanish: $served")
    assert(served("view") == ((3L, 3L)) && served("purchase") == ((1L, 1L)))
    // rerun converges: same content, stale stays zero
    val again = Takedown.purgeHllIndex(spark, path, events, ids)
    assert(again.staleBefore == 0L && again.staleAfter == 0L)
    assert(SketchIndex.distinctUsersOverRange(spark, path, 100L, 102L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap == served)
  }

  test("takedown audit equals what purged() actually produces") {
    val ids = Takedown.takedownSet(docs)
    val audit = Takedown.takedownAudit(docs).collect()
    val afterCounts = Takedown.purged(docs, ids, "doc_id")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    audit.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) - r.getLong(2) == r.getLong(4),
        s"$src: n_after must be n_docs - n_removed")
      assert(r.getLong(4) == afterCounts.getOrElse(src, 0L),
        s"$src: audit n_after must match the real purge")
    }
    assert(Takedown.leftoverCount(
      Takedown.purged(docs, ids, "doc_id"), ids, "doc_id") == 0L)
    assert(audit.map(_.getLong(2)).sum == ids.count())
  }
}
