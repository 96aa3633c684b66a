package graft.ext

import org.apache.spark.sql.SparkSession

/** Versioned persisted-artifact lifecycle: stage → validate → commit →
  * retire, for serving artifacts that are periodically REBUILT (IVF
  * index on centroid drift, PQ codebooks on distortion growth) while
  * queries keep serving.
  *
  * Layout: `<path>/v-<n>/…` per rebuilt snapshot, committed by an
  * atomically-created `_COMMITTED` marker written AFTER the snapshot's
  * data is complete and validated. Readers [[resolve]] the highest
  * committed version ONCE per query and read every component
  * (centroids + data, or the codebook table) from that one root — so a
  * query straddling a rebuild sees entirely the old snapshot or
  * entirely the new one, never a mix: the marker create is the only
  * promotion step, there is no pointer file to half-update and no
  * rename window where the serving root is missing. A snapshot with no
  * marker (crashed rebuild) is invisible to readers and overwritten by
  * the next rebuild.
  *
  * Back-compat: an artifact with NO committed versions resolves to
  * `<path>` itself — the flat layout the base builders write. The flat
  * base is retired like any superseded version once rebuilds move past
  * it.
  *
  * Retention: [[retire]] keeps the newest `keep` committed versions
  * (default 2: current + previous, so a query that resolved just
  * before a commit can still finish against its snapshot) and deletes
  * everything older, including the flat base once it is older than the
  * retention window. Because retained snapshots are REAL copies of the
  * data, takedown must purge all of them — [[retainedRoots]] is the
  * enumeration a `Takedown.propagate` artifact set must cover.
  *
  * Single-writer: concurrent rebuilds of the same artifact are a
  * deployment error (run them from one maintenance job, like
  * compaction); readers need no coordination at any time.
  */
object Versioned {

  val Marker = "_COMMITTED"

  private val VersionDir = "^v-(\\d+)$".r

  private def fsOf(spark: SparkSession, path: String)
      : org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri,
      spark.sparkContext.hadoopConfiguration)

  def versionDir(path: String, n: Long): String = s"$path/v-$n"

  /** Committed version numbers under `path`, ascending. */
  def committedVersions(spark: SparkSession, path: String): Seq[Long] = {
    val fs = fsOf(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionDir(n)
            if fs.exists(new org.apache.hadoop.fs.Path(
              s.getPath, Marker)) => Some(n.toLong)
        case _ => None
      })
      .sorted
  }

  /** The serving root: highest committed version, or the flat `path`
    * itself when no version has ever been committed. Resolve ONCE per
    * query and read every component from the result.
    */
  def resolve(spark: SparkSession, path: String): String =
    committedVersions(spark, path).lastOption
      .map(versionDir(path, _)).getOrElse(path)

  /** The next version number a rebuild stages (crashed uncommitted
    * stages are superseded in place — their number is NOT reserved,
    * so the stage dir must be cleared with [[clearStage]] first).
    */
  def nextVersion(spark: SparkSession, path: String): Long =
    committedVersions(spark, path).lastOption.getOrElse(0L) + 1

  /** Remove a stale stage dir (a crashed previous rebuild) so the new
    * stage starts clean.
    */
  def clearStage(spark: SparkSession, stage: String): Unit = {
    fsOf(spark, stage)
      .delete(new org.apache.hadoop.fs.Path(stage), true)
    ()
  }

  /** PROMOTE a fully-written, validated stage dir: atomically create
    * its `_COMMITTED` marker. After this single filesystem operation
    * every new [[resolve]] returns the staged snapshot.
    */
  def commit(spark: SparkSession, stage: String): Unit = {
    val fs = fsOf(spark, stage)
    require(fs.exists(new org.apache.hadoop.fs.Path(stage)),
      s"cannot commit missing stage $stage")
    // createNewFile semantics: fails rather than truncates if present
    val marker = new org.apache.hadoop.fs.Path(stage, Marker)
    val out = fs.create(marker, false)
    out.close()
  }

  /** Delete committed versions older than the newest `keep`, plus the
    * flat base layout (`flatSubdirs` under `path`) once at least
    * `keep` versions have superseded it. Uncommitted stage dirs older
    * than the current version are crashed-rebuild debris and are
    * removed too.
    */
  def retire(spark: SparkSession, path: String,
      flatSubdirs: Seq[String], keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least the current version")
    val fs = fsOf(spark, path)
    val committed = committedVersions(spark, path)
    val drop = committed.dropRight(keep).toSet
    val cur = committed.lastOption.getOrElse(0L)
    val p = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(p)) fs.listStatus(p).foreach { s =>
      s.getPath.getName match {
        case VersionDir(n)
            if drop.contains(n.toLong)
              || (n.toLong < cur && !committed.contains(n.toLong)) =>
          fs.delete(s.getPath, true)
        case _ => ()
      }
    }
    // the flat base is "version 0": retired once `keep` committed
    // versions exist beyond it
    if (committed.size >= keep) flatSubdirs.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$d"), true)
    }
    ()
  }

  /** Post-append race guard. An incremental append resolves the
    * serving root, writes its batch into it, then calls this: if a
    * rebuild COMMITTED between the resolve and the write, the batch
    * landed in a snapshot that is now superseded — the rebuild staged
    * from the pre-append corpus, so the batch's rows are in no current
    * snapshot and would be silently lost when the old one retires.
    * Failing loudly covers the write-spans-commit ordering without
    * coordination: the append's dynamic-partition write is
    * replay-idempotent, so the recovery is exactly "re-run the
    * append" — it re-resolves to the new snapshot and lands there
    * (the batch's rows in the retiring snapshot are harmless debris
    * the retire removes). The OTHER ordering — append write AND guard
    * both complete between the rebuild's validation read and its
    * commit, so the guard still sees the old root — is covered on the
    * rebuild side: every rebuild re-checks the superseded root's
    * CURRENT content after commit, before retiring it (see
    * `rebuildMediaFpIndexHooked` / `rebuildSearchIndexHooked` /
    * `rebuildIvfIndexHooked`). Together the two checks close the
    * append-vs-rebuild window in both directions; the documented
    * single-writer rule still applies to REBUILDS racing each other.
    */
  def assertAppendLanded(spark: SparkSession, path: String,
      landedRoot: String, what: String): Unit = {
    val now = resolve(spark, path)
    if (now != landedRoot)
      throw new IllegalStateException(
        s"$what append landed in $landedRoot but $now committed "
          + "concurrently; the batch is in a superseded snapshot and "
          + "will not be served — re-run the append (idempotent) so it "
          + "lands in the current snapshot")
  }

  /** Every root that still holds a copy of the data — the flat base
    * (if its first subdir still exists) plus all committed versions.
    * A takedown is complete only when it purged ALL of these.
    */
  def retainedRoots(spark: SparkSession, path: String,
      flatProbeSubdir: String): Seq[String] = {
    val fs = fsOf(spark, path)
    val flat =
      if (fs.exists(new org.apache.hadoop.fs.Path(
          s"$path/$flatProbeSubdir"))) Seq(path)
      else Seq.empty
    flat ++ committedVersions(spark, path).map(versionDir(path, _))
  }

  /** The roots a [[retire]] call would DELETE right now — everything
    * [[retainedRoots]] lists beyond the newest `keep` versions (the
    * flat base is the oldest). The rebuilds audit these before
    * retiring: a root about to be deleted whose content is not covered
    * by the new snapshot is the crash-recovery face of the
    * append-vs-rebuild race — an append stranded in a superseded root
    * by a rebuild that died between its commit and its own late-append
    * check would otherwise be silently deleted by the NEXT rebuild's
    * retire.
    */
  def retireTargets(spark: SparkSession, path: String,
      flatProbeSubdir: String, keep: Int = 2): Seq[String] =
    retainedRoots(spark, path, flatProbeSubdir).dropRight(keep)
}
