package graft

import org.apache.spark.sql.functions._

import graft.operators.DeletionVectors

/** Contracts of the deletion-vector table (merge-on-read position
  * deletes): filter-equivalent reads, disjoint sidecars, O(deleted)
  * delete IO, dirty-shard-only compaction with stable positions, torn
  * sidecars invisible, and a broadcast (never shuffled) masking join.
  */
class DeletionVectorsSpec extends SparkSpec {

  private def freshTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dv").toFile.getAbsolutePath
    val d = graft.core.Tables(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("n_chars"), pmod(col("doc_id"), lit(8)).as("shard"))
    DeletionVectors.writeBase(d, dir, Seq("doc_id"))
    dir
  }

  private def liveIds(dir: String): Set[Long] =
    DeletionVectors.read(spark, dir).select("doc_id").collect().map(_.getLong(0)).toSet

  private def baseIds(pred: org.apache.spark.sql.Column): Set[Long] =
    graft.core.Tables(spark, sf("sf0.001"), "documents").filter(pred)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  test("read-after-delete == filter; later vectors exclude already-deleted rows") {
    val dir = freshTable()
    val n1 = DeletionVectors.deleteWhere(spark, dir, col("n_chars") < 200, 1L)
    assert(n1 == baseIds(col("n_chars") < 200).size && n1 > 0)
    assert(liveIds(dir) == baseIds(col("n_chars") >= 200))
    // overlapping predicate: only the NEW rows land in dv 2
    val n2 = DeletionVectors.deleteWhere(spark, dir, col("n_chars") < 250, 2L)
    assert(n2 == baseIds(col("n_chars") >= 200 && col("n_chars") < 250).size)
    assert(liveIds(dir) == baseIds(col("n_chars") >= 250))
    // the takedown-list shape: delete three specific ids
    import spark.implicits._
    val wasLive = liveIds(dir)
    val keys = Seq(400L, 401L, 402L).toDF("doc_id")
    val n3 = DeletionVectors.deleteMatching(spark, dir, keys, Seq("doc_id"), 3L)
    assert(n3 == wasLive.intersect(Set(400L, 401L, 402L)).size)
    assert(liveIds(dir) == wasLive -- Set(400L, 401L, 402L))
  }

  test("delete IO is O(deleted): the sidecar is a small fraction of the base") {
    val dir = freshTable()
    DeletionVectors.deleteWhere(spark, dir, col("n_chars") < 100, 1L)
    def bytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }
    val dv = bytes(s"$dir/${DeletionVectors.DvPrefix}1")
    val base = bytes(s"$dir/${DeletionVectors.BasePrefix}0")
    assert(dv > 0 && dv < base / 4,
      s"dv sidecar $dv bytes vs base $base — delete IO should be delete-scale")
  }

  test("compaction rewrites ONLY dirty shards, preserves positions, keeps reads equal") {
    val dir = freshTable()
    DeletionVectors.deleteWhere(spark, dir, col("shard") === 2 && col("n_chars") < 300, 1L)
    val before = liveIds(dir)
    val posBefore = DeletionVectors.read(spark, dir)
      .filter(col("shard") === 2).select("doc_id", "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rewritten = DeletionVectors.compactApply(spark, dir, 10L)
    assert(rewritten == Seq(2L), s"expected only shard 2 rewritten, got $rewritten")
    val newShards = new java.io.File(s"$dir/${DeletionVectors.BasePrefix}10/data")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(newShards == Set("shard=2"), s"new base holds $newShards")
    assert(liveIds(dir) == before, "read must be identical across compaction")
    val posAfter = DeletionVectors.read(spark, dir)
      .filter(col("shard") === 2).select("doc_id", "pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(posAfter == posBefore, "compaction must not reassign surviving positions")
    // position references stay valid: a post-compaction delete works
    val someId = posAfter.keys.min
    DeletionVectors.deleteWhere(spark, dir, col("doc_id") === someId, 11L)
    assert(liveIds(dir) == before - someId)
  }

  test("a torn (uncommitted) deletion vector is invisible to readers") {
    val dir = freshTable()
    val before = liveIds(dir)
    // simulate a crash after the dv parquet lands but before the marker
    DeletionVectors.read(spark, dir).filter(col("n_chars") < 200)
      .select("shard", "pos")
      .write.mode("overwrite").parquet(s"$dir/${DeletionVectors.DvPrefix}7/dv")
    assert(liveIds(dir) == before, "uncommitted dv must not mask rows")
  }

  test("the masking join broadcasts — the base never shuffles for deletes") {
    val dir = freshTable()
    DeletionVectors.deleteWhere(spark, dir, col("n_chars") < 150, 1L)
    val df = DeletionVectors.read(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join, plan:\n${plan.take(800)}")
    assert(!plan.contains("SortMergeJoin"),
      "DV masking must not sort-merge the base")
  }
}
