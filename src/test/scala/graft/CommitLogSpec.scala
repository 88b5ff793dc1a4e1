package graft

import org.apache.spark.sql.functions._

import graft.core.{ArtifactIO, CommitLog}
import graft.operators.DeletionVectors
import graft.sources.SkippingIndex
import graft.streaming.DeltaState

/** Contracts of the shared commit log: exclusive version claims
  * (optimistic concurrency — one winner, a loud conflict for the
  * loser), allocation that serializes racing writers, and the ONE
  * janitor entry point that compacts every versioned substrate by its
  * descriptor file.
  */
class CommitLogSpec extends SparkSpec {

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toFile.getAbsolutePath

  test("claim is exclusive: second writer gets CommitConflict; allocate probes past it") {
    val dir = tmp("graft-cl")
    CommitLog.claim(spark, dir, "v=", 5L)
    intercept[CommitLog.CommitConflict] { CommitLog.claim(spark, dir, "v=", 5L) }
    // the loser re-allocates and lands above the winner's claim
    assert(CommitLog.allocate(spark, dir, "v=") == 6L)
    // a committed version also conflicts (double-commit guard at claim time)
    ArtifactIO.mkdirs(spark, s"$dir/v=9")
    ArtifactIO.commit(spark, s"$dir/v=9")
    intercept[CommitLog.CommitConflict] { CommitLog.claim(spark, dir, "v=", 9L) }
  }

  test("publishExclusive refuses a double commit of the same version") {
    val dir = tmp("graft-cl-pub")
    ArtifactIO.mkdirs(spark, s"$dir/v=1")
    CommitLog.publishExclusive(spark, s"$dir/v=1")
    assert(ArtifactIO.isCommitted(spark, s"$dir/v=1"))
    intercept[CommitLog.CommitConflict] { CommitLog.publishExclusive(spark, s"$dir/v=1") }
  }

  test("a genuine race on one id has exactly one winner (atomic create)") {
    val dir = tmp("graft-cl-race")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        try { CommitLog.claim(spark, dir, "v=", 3L); results.add(true) }
        catch { case _: CommitLog.CommitConflict => results.add(false) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.count(identity) == 1,
      s"expected exactly one winning claim, got ${results.asScala.count(identity)}")
  }

  test("stale claims below the newest committed version are releasable debris") {
    val dir = tmp("graft-cl-stale")
    CommitLog.claim(spark, dir, "v=", 1L) // crashed writer: claimed, never committed
    ArtifactIO.mkdirs(spark, s"$dir/v=4")
    ArtifactIO.commit(spark, s"$dir/v=4")
    CommitLog.claim(spark, dir, "v=", 7L) // in-flight writer above the floor: kept
    assert(CommitLog.releaseStaleClaims(spark, dir, "v=") == Seq(1L))
    assert(CommitLog.claimed(spark, dir, "v=") == Seq(7L))
  }

  private def freshDvTable(): String = {
    val dir = tmp("graft-cl-dv")
    val d = graft.core.Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("n_chars"), pmod(col("doc_id"), lit(8)).as("shard"))
    DeletionVectors.writeBase(d, dir, Seq("doc_id"))
    dir
  }

  private def liveIds(dir: String): Set[Long] =
    DeletionVectors.read(spark, dir).select("doc_id").collect().map(_.getLong(0)).toSet

  test("two interleaved deletion-vector writers serialize through allocation; state composes as if sequential") {
    import spark.implicits._
    val dir = freshDvTable()
    val before = liveIds(dir)
    // writer A (takedown list) and writer B (quality purge) both allocate:
    // ids come out distinct and ordered, both mutations apply
    val (idA, nA) = DeletionVectors.deleteMatchingConcurrent(spark, dir,
      Seq(400L, 401L, 402L).toDF("doc_id"), Seq("doc_id"))
    val (idB, nB) = DeletionVectors.deleteWhereConcurrent(spark, dir, col("n_chars") < 150)
    assert(idA < idB, s"allocation must serialize: got $idA then $idB")
    assert(nA == before.intersect(Set(400L, 401L, 402L)).size && nB > 0)
    val want = before -- Set(400L, 401L, 402L)
    val expectB = graft.core.Tables(spark, sf("sf0.001"), "documents")
      .filter(col("n_chars") < 150).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(liveIds(dir) == want -- expectB, "concurrent writers lost an update")
    // and a third writer upserting allocates above both
    val batch = Seq((400L, 9999L, 0L)).toDF("doc_id", "n_chars", "shard")
    val (idC, _, nApp) = DeletionVectors.upsertConcurrent(spark, dir, batch,
      Seq("doc_id"), Seq("doc_id"))
    assert(idC > idB && nApp == 1)
    assert(liveIds(dir).contains(400L), "upserted row missing")
  }

  test("two writers on the SAME precomputed id: one wins, one conflicts, state equals the winner") {
    val dir = freshDvTable()
    val before = liveIds(dir)
    // both writers decided "my version is 1" without allocating
    CommitLog.claim(spark, dir, DeletionVectors.DvPrefix, 1L) // writer A reserves
    val nA = DeletionVectors.deleteWhere(spark, dir, col("n_chars") < 150, 1L)
    // writer B arrives with the same id: the claim conflicts BEFORE it
    // writes a byte into A's version directory
    intercept[CommitLog.CommitConflict] {
      CommitLog.claim(spark, dir, DeletionVectors.DvPrefix, 1L)
    }
    val afterA = liveIds(dir)
    assert(before.size - afterA.size == nA)
    // B retries through allocation and applies cleanly on top
    val (idB, _) = DeletionVectors.deleteWhereConcurrent(spark, dir, col("n_chars") < 200)
    assert(idB > 1L && liveIds(dir).subsetOf(afterA))
  }

  test("janitor dispatches by descriptor: deletion-vector table folds under an allocated base id") {
    val dir = freshDvTable()
    DeletionVectors.deleteWhereConcurrent(spark, dir, col("n_chars") < 200)
    val view = liveIds(dir)
    val report = CommitLog.janitor(spark, dir)
    assert(report.substrate == "deletion-vectors" && report.removed.nonEmpty)
    assert(liveIds(dir) == view, "janitor fold changed the view")
    assert(ArtifactIO.committedVersions(spark, dir, DeletionVectors.DvPrefix).isEmpty,
      "folded DV sidecars should be gone")
    // a second pass has nothing to do
    assert(CommitLog.janitor(spark, dir).removed.isEmpty)
  }

  test("janitor dispatches by descriptor: skipping index folds when versions exceed keep") {
    val d = graft.core.Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("n_chars"))
      .withColumn("cluster", expr("doc_id div 16"))
    val dir = tmp("graft-cl-skip")
    SkippingIndex.build(d.filter(col("doc_id") % 3 === 0), dir, "cluster", Seq("doc_id"), "doc_id")
    SkippingIndex.append(d.filter(col("doc_id") % 3 === 1), dir, "cluster", Seq("doc_id"), "doc_id", 1L)
    // under the keep threshold: janitor leaves the chain alone
    assert(CommitLog.janitor(spark, dir, keep = 2).removed.isEmpty)
    SkippingIndex.append(d.filter(col("doc_id") % 3 === 2), dir, "cluster", Seq("doc_id"), "doc_id", 2L)
    def allRows() = SkippingIndex.readClusters(spark, dir,
      SkippingIndex.stats(spark, dir).select(col("cluster").cast("long"))
        .collect().map(_.getLong(0)).toSeq).count()
    val n = allRows()
    assert(n == d.count())
    val report = CommitLog.janitor(spark, dir, keep = 2)
    assert(report.substrate == "skipping-index" && report.removed == Seq(0L, 1L, 2L))
    assert(SkippingIndex.sideVersionCount(spark, dir) == 1L && allRows() == n)
  }

  test("janitor dispatches by descriptor: delta-state chain folds deltas into a base") {
    import spark.implicits._
    val dir = tmp("graft-cl-ds")
    val layout = Seq(DeltaState.Table("t", DeltaState.Sum(Seq("k"))))
    (0L to 3L).foreach { v =>
      DeltaState.writeDelta(spark, dir, v, layout,
        Seq("t" -> Seq(("a", 1L), ("b", 2L)).toDF("k", "n")))
    }
    val want = DeltaState.asOf(spark, dir, layout.head).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val report = CommitLog.janitor(spark, dir)
    assert(report.substrate == "delta-state" && report.removed.nonEmpty)
    val got = DeltaState.asOf(spark, dir, layout.head).get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got == Map("a" -> 4L, "b" -> 8L))
  }
}
