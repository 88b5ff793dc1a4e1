package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.ArtifactIO

/** DELETION VECTORS — row-level deletes on immutable columnar storage
  * without rewriting data files (the Delta/Iceberg "merge-on-read
  * position delete" pattern): the base table is written once, sharded
  * into partition directories with a stable per-row POSITION, and each
  * delete writes only a (shard, pos) sidecar — O(deleted rows) of IO,
  * while the read path masks deleted positions with a broadcast
  * anti-join. Periodic [[compactApply]] folds the vectors in by
  * rewriting ONLY the shards that have deletions, leaving clean shards'
  * files untouched (a manifest maps each shard to the base version that
  * serves it). At 100 TB this is the GDPR/right-to-be-forgotten and
  * retroactive-curation write path: a takedown of 10k documents costs
  * kilobytes of sidecar, not a warehouse rewrite, and the masking join
  * broadcasts (the DV set is delete-scale, never data-scale).
  *
  * On-disk layout under `outDir`:
  *  - `base_v=<id>/data/shard=<s>/…` — immutable shard files; v0 is the
  *    initial write, later versions hold only shards rewritten by a
  *    compaction;
  *  - `dv_v=<id>/dv/` — one delete's (shard, pos) rows;
  *  - `_MANIFEST` — `shard|baseVersion` lines: which base version
  *    serves each shard (atomic single-object rewrite);
  *  - every version directory is published by [[ArtifactIO.commit]]
  *    AFTER its tables land — a crash mid-write leaves an uncommitted
  *    directory no reader selects, and [[deleteAt]] clears a
  *    pre-existing marker before overwriting (the replay-window
  *    convention shared with [[graft.streaming.DeltaState]]).
  *
  * Positions are assigned ONCE at [[writeBase]] (per-shard rank over
  * the caller's ordering columns) and are NEVER reassigned — a
  * compaction preserves surviving rows' positions (gaps are fine), so
  * (shard, pos) references in later deletion vectors stay valid across
  * compactions.
  */
object DeletionVectors {
  val BasePrefix = "base_v="
  val DvPrefix = "dv_v="
  val ManifestFile = "_MANIFEST"

  /** Initial immutable write: `df` must carry a long `shard` column;
    * assigns `pos` per shard by `orderCols` (a per-shard window —
    * per-file ordering, what a real format's writer gets for free at
    * task commit), writes `base_v=0` partitioned by shard, and points
    * every shard's manifest entry at v0.
    */
  def writeBase(df: DataFrame, outDir: String, orderCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    require(df.columns.contains("shard"), "writeBase needs a 'shard' column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(orderCols.map(col): _*)
    val withPos = df.withColumn("pos", row_number().over(w).cast("long"))
    val dir = s"$outDir/${BasePrefix}0"
    ArtifactIO.delete(spark, s"$dir/${ArtifactIO.CommitMarker}")
    withPos.write.mode("overwrite").partitionBy("shard").parquet(s"$dir/data")
    ArtifactIO.commit(spark, dir)
    // |shards|-row driver collect: the manifest is metadata-scale
    val shards = withPos.select(col("shard").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    ArtifactIO.writeAtomicString(spark, s"$outDir/$ManifestFile",
      shards.map(s => s"$s|0").mkString("\n"))
  }

  private def manifest(spark: SparkSession, outDir: String): Seq[(Long, Long)] =
    ArtifactIO.readString(spark, s"$outDir/$ManifestFile")
      .split("\n").toSeq.filter(_.nonEmpty).map { l =>
        val Array(s, v) = l.split("\\|"); (s.toLong, v.toLong)
      }

  /** The manifest as a DataFrame `(shard, base_version)` — metadata
    * scale (|shards| rows), for audits over which shards a compaction
    * rewrote.
    */
  def shardVersions(spark: SparkSession, outDir: String): DataFrame = {
    import spark.implicits._
    manifest(spark, outDir).toDF("shard", "base_version")
  }

  private def committedDvs(spark: SparkSession, outDir: String): Seq[Long] =
    ArtifactIO.committedVersions(spark, outDir, DvPrefix)

  private def dvUnion(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val vs = committedDvs(spark, outDir)
    if (vs.isEmpty) None
    else Some(vs.map(v => spark.read.parquet(s"$outDir/$DvPrefix$v/dv"))
      .reduce(_ unionByName _))
  }

  /** The live table: each shard read from the base version its manifest
    * entry names (cluster `IN` → PartitionFilters), minus every
    * committed deletion vector's positions — the DV side is
    * delete-scale, so the anti-join BROADCASTS (plan-asserted in
    * DeletionVectorsSpec); the base never shuffles.
    */
  def read(spark: SparkSession, outDir: String): DataFrame = {
    val m = manifest(spark, outDir)
    val byVersion = m.groupBy(_._2).toSeq.sortBy(_._1)
    val base = byVersion.map { case (v, entries) =>
      val shards = entries.map(_._1)
      spark.read.parquet(s"$outDir/$BasePrefix$v/data")
        .filter(col("shard").isin(shards: _*))
    }.reduce(_ unionByName _)
    dvUnion(spark, outDir) match {
      case Some(dv) =>
        base.join(broadcast(dv.select(col("shard"), col("pos"))),
          Seq("shard", "pos"), "left_anti")
      case None => base
    }
  }

  private def writeDv(spark: SparkSession, outDir: String, dvId: Long,
      rows: DataFrame): Long = {
    val dir = s"$outDir/$DvPrefix$dvId"
    ArtifactIO.delete(spark, s"$dir/${ArtifactIO.CommitMarker}")
    rows.write.mode("overwrite").parquet(s"$dir/dv")
    val n = spark.read.parquet(s"$dir/dv").count()
    ArtifactIO.commit(spark, dir)
    n
  }

  /** Delete the LIVE rows matching `pred` as deletion vector `dvId`;
    * rows already masked by earlier vectors are not re-recorded (the
    * sidecars stay disjoint). Returns the number of positions written.
    */
  def deleteWhere(spark: SparkSession, outDir: String, pred: Column,
      dvId: Long): Long =
    writeDv(spark, outDir, dvId,
      read(spark, outDir).filter(pred).select(col("shard"), col("pos")))

  /** Delete the live rows matching `keys` on `joinCols` (the GDPR /
    * takedown-list shape: the delete set arrives as keys, not a
    * predicate). Same disjointness contract as [[deleteWhere]].
    */
  def deleteMatching(spark: SparkSession, outDir: String, keys: DataFrame,
      joinCols: Seq[String], dvId: Long): Long =
    writeDv(spark, outDir, dvId,
      read(spark, outDir).join(keys, joinCols, "left_semi")
        .select(col("shard"), col("pos")))

  /** Fold the deletion vectors in: rewrite ONLY the shards that carry
    * deletions into `base_v=newBaseId` (surviving rows keep their
    * positions), repoint those shards' manifest entries, then drop the
    * vectors. Clean shards' files are untouched. Publication order
    * makes a racing reader consistent either way: the new base commits
    * BEFORE the manifest flips (an old-manifest reader still masks via
    * the DVs), and the DVs are deleted AFTER (a new-manifest reader
    * anti-joins positions that are already gone — a no-op). Returns the
    * rewritten shard ids.
    */
  def compactApply(spark: SparkSession, outDir: String, newBaseId: Long): Seq[Long] = {
    val dvs = committedDvs(spark, outDir)
    if (dvs.isEmpty) return Seq.empty
    val dv = dvUnion(spark, outDir).get
    // |shards|-bounded driver collect (metadata scale)
    val dirty = dv.select(col("shard").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (dirty.isEmpty) return Seq.empty
    val dir = s"$outDir/$BasePrefix$newBaseId"
    ArtifactIO.delete(spark, dir) // crashed previous attempt
    read(spark, outDir).filter(col("shard").isin(dirty: _*))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$dir/data")
    ArtifactIO.commit(spark, dir)
    val m = manifest(spark, outDir).map { case (s, v) =>
      (s, if (dirty.contains(s)) newBaseId else v)
    }
    ArtifactIO.writeAtomicString(spark, s"$outDir/$ManifestFile",
      m.map { case (s, v) => s"$s|$v" }.mkString("\n"))
    dvs.foreach(v => ArtifactIO.delete(spark, s"$outDir/$DvPrefix$v"))
    dirty
  }
}
