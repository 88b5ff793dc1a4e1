package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** THE transaction log shared by every versioned substrate in the repo —
  * the delta-state sink chains ([[graft.streaming.DeltaState]]), the
  * skipping-index sidecars ([[graft.sources.SkippingIndex]]) and the
  * deletion-vector tables ([[graft.operators.DeletionVectors]]). A real
  * lakehouse has ONE commit protocol that every writer goes through
  * (Delta's `_delta_log`, Iceberg's metadata tree); before round 11
  * this repo had three bespoke version/manifest mechanisms that shared
  * only the marker-file convention. This object is the single place
  * where version PUBLICATION, version ALLOCATION (with optimistic
  * concurrency), and version RETIREMENT (the janitor) are defined.
  *
  * Two publication modes, chosen by who assigns version ids:
  *
  *  - REPLAYABLE ([[begin]]/[[publish]]): the producer assigns ids
  *    deterministically (streaming batch ids) and redelivery of id v
  *    legitimately OVERWRITES `v`'s directory — exactly-once lands on
  *    idempotent replay, not on locking. `begin` clears the marker
  *    before the overwrite so a crash mid-replay leaves an uncommitted
  *    directory (the torn-version invariant).
  *
  *  - EXCLUSIVE ([[claim]]/[[allocate]] + [[publishExclusive]]):
  *    concurrent ad-hoc writers (two engineers' takedown jobs, a
  *    compaction racing an append) serialize by ATOMIC CREATE — the
  *    first writer to create the claim file owns the id; the loser gets
  *    [[CommitConflict]] and retries at the next id against the now-
  *    newer state. This is rename-as-commit at directory scale — the
  *    same single-atomic-operation trick the reference engine uses for
  *    task output files (`worker.rs:107-114`: write temp, rename into
  *    place, first one wins). Claim BEFORE writing any data: the claim
  *    reserves the directory name, so two writers never interleave
  *    writes into the same version dir.
  *
  * Atomicity of the claim, per store: local file systems go through
  * `O_EXCL` ([[java.nio.file.Files.createFile]] — POSIX-atomic); HDFS
  * `create(overwrite = false)` is atomic at the NameNode; S3 needs a
  * conditional PUT (`If-None-Match`), which the S3A connector exposes —
  * documented, like every [[ArtifactIO]] store note, not assumed.
  */
object CommitLog {
  /** Version-dir publication marker (shared with [[ArtifactIO]] — every
    * pre-existing on-disk layout remains valid).
    */
  val Marker: String = ArtifactIO.CommitMarker
  val ClaimSuffix = "._CLAIM"

  /** Thrown when a writer loses an exclusive commit race: its version id
    * was claimed or published by another writer first. The loser must
    * re-read state and retry with a fresh id ([[allocate]] does both).
    */
  final class CommitConflict(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------------
  // discovery
  // ------------------------------------------------------------------

  /** Committed ids of `<prefix><id>` version dirs under `dir`, ascending. */
  def committed(spark: SparkSession, dir: String, prefix: String): Seq[Long] =
    ArtifactIO.committedVersions(spark, dir, prefix)

  /** Ids currently CLAIMED (reserved by a writer that may still be
    * in flight) for `prefix` under `dir`.
    */
  def claimed(spark: SparkSession, dir: String, prefix: String): Seq[Long] =
    ArtifactIO.list(spark, dir)
      .filter(n => n.startsWith(prefix) && n.endsWith(ClaimSuffix))
      .map(_.stripPrefix(prefix).stripSuffix(ClaimSuffix))
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).sorted

  // ------------------------------------------------------------------
  // replayable publication (producer-assigned ids)
  // ------------------------------------------------------------------

  /** Open version `versionDir` for (re)writing: clears a pre-existing
    * marker so a crash mid-overwrite leaves the version uncommitted.
    */
  def begin(spark: SparkSession, versionDir: String): Unit =
    ArtifactIO.delete(spark, s"$versionDir/$Marker")

  /** Publish a version: its tables are all on disk; readers may now
    * select it. Idempotent (replay republished its own overwrite).
    */
  def publish(spark: SparkSession, versionDir: String): Unit =
    ArtifactIO.commit(spark, versionDir)

  // ------------------------------------------------------------------
  // exclusive publication (optimistic concurrency)
  // ------------------------------------------------------------------

  private def atomicCreate(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val scheme = Option(p.toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      // O_EXCL — atomic on POSIX; Hadoop's local create(overwrite=false)
      // is an exists()-then-create TOCTOU, so go through NIO directly
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      try { java.nio.file.Files.createFile(local); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      val f = ArtifactIO.fs(spark, path)
      try { f.create(p, false).close(); true }
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    }
  }

  /** Reserve version id `id` of `<prefix>` under `dir` by atomic create
    * of the claim file. Throws [[CommitConflict]] if another writer
    * holds it (claimed OR already committed). Claim before writing any
    * table data into the version directory.
    */
  def claim(spark: SparkSession, dir: String, prefix: String, id: Long): Unit = {
    if (ArtifactIO.isCommitted(spark, s"$dir/$prefix$id"))
      throw new CommitConflict(s"$prefix$id under $dir is already committed")
    if (!atomicCreate(spark, s"$dir/$prefix$id$ClaimSuffix"))
      throw new CommitConflict(s"$prefix$id under $dir is claimed by another writer")
    validateClaim(spark, dir, prefix, id)
  }

  /** Post-create re-check closing the TOCTOU between [[claim]]'s
    * isCommitted check and its atomic create: [[publishExclusive]]
    * creates the marker THEN deletes the winner's claim, so a racer
    * whose isCommitted check ran before the marker landed can re-create
    * the claim file after it is deleted and believe it owns an already-
    * committed id — its begin()/overwrite would then trample committed
    * data. Re-checking AFTER the create is sound: a commit marker can
    * only appear for an id whose claim the committer held, so if the
    * marker exists now, this claim is the stale-racer case — release it
    * and conflict.
    */
  private[graft] def validateClaim(spark: SparkSession, dir: String,
      prefix: String, id: Long): Unit =
    if (ArtifactIO.isCommitted(spark, s"$dir/$prefix$id")) {
      ArtifactIO.delete(spark, s"$dir/$prefix$id$ClaimSuffix")
      throw new CommitConflict(
        s"$prefix$id under $dir was committed while being claimed (raced a publishExclusive)")
    }

  /** Allocate the next free version id above `floor`, every committed id
    * and every live claim, reserving it via [[claim]]; racing allocators
    * serialize (the loser's claim conflicts and it probes upward).
    * Callers pass `floor` = the highest id their substrate knows from
    * OTHER prefixes (e.g. a deletion-vector table's base versions), so
    * cross-prefix monotonicity holds under concurrency too.
    */
  def allocate(spark: SparkSession, dir: String, prefix: String,
      floor: Long = -1L): Long = {
    var id = (committed(spark, dir, prefix) ++ claimed(spark, dir, prefix) :+ floor).max + 1
    var attempts = 0
    while (attempts < 1000) {
      try { claim(spark, dir, prefix, id); return id }
      catch { case _: CommitConflict => id += 1; attempts += 1 }
    }
    throw new CommitConflict(s"could not allocate a $prefix id under $dir after 1000 probes")
  }

  /** Publish a claimed version EXCLUSIVELY: refuses (conflict) if the
    * version is already committed — the double-commit guard — and
    * releases the claim on success. The marker create itself is the
    * atomic commit point.
    */
  def publishExclusive(spark: SparkSession, versionDir: String): Unit = {
    if (!atomicCreate(spark, s"$versionDir/$Marker"))
      throw new CommitConflict(s"$versionDir is already committed by another writer")
    val p = new Path(versionDir)
    ArtifactIO.delete(spark, s"${p.getParent}/${p.getName}$ClaimSuffix")
  }

  /** Drop stale claims whose version never committed and whose id is
    * below the newest committed one — crash debris no writer can target
    * again (allocation always probes above the newest committed id).
    */
  def releaseStaleClaims(spark: SparkSession, dir: String, prefix: String): Seq[Long] = {
    val newest = committed(spark, dir, prefix).lastOption.getOrElse(-1L)
    claimed(spark, dir, prefix)
      .filter(id => id < newest && !ArtifactIO.isCommitted(spark, s"$dir/$prefix$id"))
      .map { id => ArtifactIO.delete(spark, s"$dir/$prefix$id$ClaimSuffix"); id }
  }

  // ------------------------------------------------------------------
  // the janitor — ONE compaction entry point for every substrate
  // ------------------------------------------------------------------

  final case class JanitorReport(substrate: String, removed: Seq[Long])

  /** Compact/retire versions of the table at `dir`, whatever substrate
    * it is — the substrate is identified by its own descriptor file
    * (each substrate writes one at creation so a generic janitor needs
    * no out-of-band type registry):
    *
    *  - `_LAYOUT`   → a delta-state sink chain: fold deltas below the
    *    newest `keep` reconstruction points into a base snapshot
    *    ([[graft.streaming.DeltaState.compact]]);
    *  - `_MANIFEST` → a deletion-vector table: fold DVs + appends into
    *    rewritten dirty shards under a base id allocated THROUGH THIS
    *    LOG ([[graft.operators.DeletionVectors.compactApply]]);
    *  - `_INDEX`    → a skipping index: fold data + sidecar versions
    *    into one ([[graft.sources.SkippingIndex.compact]]), when more
    *    than `keep` versions have accumulated.
    *
    * Returns what was retired, per substrate semantics. Unrecognized
    * directories are left untouched (reported as substrate "none").
    */
  def janitor(spark: SparkSession, dir: String, keep: Int = 2): JanitorReport = {
    if (ArtifactIO.exists(spark, s"$dir/${graft.streaming.DeltaState.LayoutFile}"))
      JanitorReport("delta-state", graft.streaming.DeltaState.compact(spark, dir, math.max(keep, 2)))
    else if (ArtifactIO.exists(spark, s"$dir/${graft.operators.DeletionVectors.ManifestFile}")) {
      val dv = graft.operators.DeletionVectors
      // RETENTION-WINDOW GC: physically retire only the sidecars an
      // EARLIER pass folded — a reader that listed the chain just before
      // this pass's fold can still open every file it saw (Delta's
      // vacuum-after-retention; the window is one janitor interval).
      dv.vacuumSidecars(spark, dir)
      // the floor clears LIVE CLAIMS too: a new base id below an
      // in-flight append's claimed id would hide that append's rows
      // via the version guard the moment it commits
      val floor = (committed(spark, dir, dv.BasePrefix) ++
        committed(spark, dir, dv.DvPrefix) ++
        committed(spark, dir, dv.AppendPrefix) ++
        claimed(spark, dir, dv.DvPrefix) ++
        claimed(spark, dir, dv.AppendPrefix) ++
        dv.shardVersions(spark, dir).collect().map(_.getLong(1)).toSeq :+ -1L).max
      val newBaseId = allocate(spark, dir, dv.BasePrefix, floor)
      val removed = dv.compactApply(spark, dir, newBaseId, gc = false)
      ArtifactIO.delete(spark, s"$dir/${dv.BasePrefix}$newBaseId$ClaimSuffix")
      JanitorReport("deletion-vectors", removed)
    } else if (ArtifactIO.exists(spark, s"$dir/${graft.sources.SkippingIndex.IndexFile}")) {
      val si = graft.sources.SkippingIndex
      // same retention-window GC: versions a previous pass superseded
      si.vacuum(spark, dir)
      val live = si.visibleVersionDirs(spark, dir).size
      if (live <= keep) JanitorReport("skipping-index", Seq.empty)
      else {
        val vs = committed(spark, dir, si.VersionPrefix) ++
          committed(spark, dir, si.BasePrefix)
        val newId = allocate(spark, dir, si.BasePrefix, vs.max)
        val removed = si.compact(spark, dir, newId, gc = false)
        ArtifactIO.delete(spark, s"$dir/${si.BasePrefix}$newId$ClaimSuffix")
        JanitorReport("skipping-index", removed)
      }
    } else JanitorReport("none", Seq.empty)
  }
}
