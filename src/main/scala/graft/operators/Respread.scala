package graft.operators

import org.apache.spark.sql.DataFrame

/** Guarded round-robin respread for compute-dense pipelines over
  * under-split sources.
  *
  * The failure mode: a scan's parallelism is bounded by its input
  * splits, and a parquet file is splittable only at row-group
  * boundaries — a small single-row-group file (the test fixtures; any
  * compacted dimension extract) is ONE task no matter what
  * `spark.sql.files.maxPartitionBytes` says. That is fine for
  * byte-bound scans, but a pipeline that does heavy per-row work before
  * its first shuffle (tokenize→shingle a text column, 64-plane SRP
  * signatures over vectors, deletion-neighborhood explosion) then runs
  * serialized on one core. AQE cannot help: it only re-plans AFTER a
  * shuffle materializes, and its coalescing actively worsens the shape
  * by merging small exchanges below the per-row cost horizon.
  *
  * The guard makes this scale-safe: respread only fires when the
  * source has FEWER partitions than the session's parallelism. At
  * 100 TB every real table scan has thousands of splits, the guard is
  * false, and no extra shuffle is ever added — the repartition exists
  * exactly in the regime where the shuffled volume is trivially small.
  */
object Respread {
  /** df, round-robin repartitioned to the default parallelism iff its
    * current physical partitioning is coarser. Round-robin (not keyed):
    * there is no key to preserve, and a keyed repartition matching an
    * upstream exchange is elided as redundant and re-coalesced by AQE.
    */
  def ifCoarse(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
