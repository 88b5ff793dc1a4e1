package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** FILE-LEVEL DATA-SKIPPING INDEX — the lakehouse table-format feature
  * (Delta/Iceberg/Hudi file statistics + bloom filters) re-expressed
  * Spark-first: a table is written clustered into partition directories
  * (the stand-ins for "files" at demo scale), and a sidecar STATS table
  * carries, per cluster,
  *
  *  - min/max of the declared range columns (zone maps), and
  *  - a fixed-width bloom filter over a declared point-lookup column,
  *
  * so a selective query consults the |files|-row stats table FIRST and
  * plans a scan over only the clusters that can possibly match. At
  * 100 TB this is the difference between "scan the corpus to find one
  * document" and "read the 2 files whose zone map / bloom admits the
  * key": the stats table is metadata-scale (one row per file — millions
  * of rows for a 100 TB table, a trivial driver/broadcast read exactly
  * like every table format's manifest), and the data scan is driven by
  * `cluster IN (…)`, which Spark turns into PartitionFilters — files
  * outside the selection are never opened.
  *
  * The bloom is built from PORTABLE arithmetic only ([[PortableHash]]
  * coefficients, mod 2^31−1, positions into `Words`×63-bit words) so an
  * independent engine replays bit-identical masks from the same input —
  * 63 data bits per word because engines that trap BIGINT overflow
  * (DuckDB) reject `1 << 63`. k = 2 probes; with 32 words (2016 bits)
  * a 100-key file sits at ~10% occupancy → ~1% false-positive rate.
  * False positives cost a wasted file read; false negatives are
  * impossible (the spec pins this).
  *
  * Reference scope note: the reference engine (another-map-reduce)
  * always scans every input file (`worker.rs:93` — whole files, no
  * statistics); skipping indexes are part of the beyond-reference
  * 100 TB surface, like Z-ordering (q111) and bucketed joins (q116).
  */
object SkippingIndex {
  /** 63 usable bits per bloom word — `1 << 63` overflows BIGINT in
    * engines that trap (DuckDB); staying below the sign bit keeps every
    * mask positive and the arithmetic identical everywhere.
    */
  val WordBits = 63
  /** Bloom width in 63-bit words (2016 bits). */
  val Words = 32
  val P: Long = PortableHash.MinHashP
  /** k = 2 independent probe hash functions, derived from the same
    * deterministic coefficient family as the MinHash permutations
    * (indices 101/102 — disjoint from the signature family's 0..127 by
    * convention only; any fixed pair works).
    */
  val (probeA1, probeB1) = PortableHash.minHashCoeffs(101)
  val (probeA2, probeB2) = PortableHash.minHashCoeffs(102)

  /** Bit position of probe `j` (0/1) for hash column `h` (values in
    * [0, 2^31): both probes stay in Long range — a·h < 2^62).
    */
  def bitposCol(h: Column, j: Int): Column = {
    val (a, b) = if (j == 0) (probeA1, probeB1) else (probeA2, probeB2)
    ((h % P) * lit(a) + lit(b)) % P % (Words * WordBits)
  }

  /** Driver-side twin of [[bitposCol]] for probing with a literal key. */
  def bitposScala(h: Long, j: Int): Long = {
    val (a, b) = if (j == 0) (probeA1, probeB1) else (probeA2, probeB2)
    ((h % P) * a + b) % P % (Words * WordBits)
  }

  /** Write `df` clustered by `clusterCol` (one partition directory per
    * cluster — the "file" granule) plus the two stats sidecars:
    * `stats` (cluster, n_rows, min/max per range column) and `bloom`
    * (cluster, word, mask) over `bloomCol` (a Long hash column, e.g. a
    * portable document fingerprint). One pass for the data, one
    * aggregation pass each for the sidecars — at production scale the
    * sidecars are emitted by the same write job's task-commit stats.
    *
    * Sidecars are VERSIONED and MERGEABLE: both are sketches whose
    * merge is associative (count → sum, zone map → min/max, bloom →
    * bit-or), so [[append]] writes only the BATCH's sidecar delta and
    * readers fold versions at metadata scale — ingestion never
    * recomputes global statistics (the Iceberg "metadata is mergeable
    * manifests" property).
    */
  def build(df: DataFrame, outDir: String, clusterCol: String,
      rangeCols: Seq[String], bloomCol: String): Unit = {
    df.write.mode("overwrite").partitionBy(clusterCol).parquet(s"$outDir/data")
    writeSidecars(df, outDir, clusterCol, rangeCols, bloomCol, 0L)
  }

  /** Append a batch: data files land INSIDE the existing cluster
    * directories (no rewrite), and the batch's own sidecar aggregates
    * land as version `appendId` — O(batch) everywhere. The caller's
    * cluster assignment must be ingestion-stable (same cluster function
    * as [[build]]).
    */
  def append(df: DataFrame, outDir: String, clusterCol: String,
      rangeCols: Seq[String], bloomCol: String, appendId: Long): Unit = {
    df.write.mode("append").partitionBy(clusterCol).parquet(s"$outDir/data")
    writeSidecars(df, outDir, clusterCol, rangeCols, bloomCol, appendId)
  }

  private def writeSidecars(df: DataFrame, outDir: String, clusterCol: String,
      rangeCols: Seq[String], bloomCol: String, v: Long): Unit = {
    val aggs = count(lit(1)).as("n_rows") +:
      rangeCols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c")))
    df.groupBy(col(clusterCol).as("cluster"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(s"$outDir/stats/v=$v")
    val probes = Seq(0, 1).map(j =>
      df.select(col(clusterCol).as("cluster"), bitposCol(col(bloomCol), j).as("bp")))
      .reduce(_ unionByName _)
    probes
      .select(col("cluster"), (col("bp") / WordBits).cast("long").as("word"),
        expr(s"shiftleft(cast(1 as bigint), cast(bp % $WordBits as int))").as("m"))
      .groupBy("cluster", "word").agg(bit_or(col("m")).as("mask"))
      .write.mode("overwrite").parquet(s"$outDir/bloom/v=$v")
  }

  /** The committed sidecar version directories of `side` (stats/bloom),
    * read separately and unioned so the `v=` dir name never partition-
    * infers into the schema.
    */
  private def sideUnion(spark: SparkSession, outDir: String, side: String): DataFrame = {
    val dirs = graft.core.ArtifactIO.list(spark, s"$outDir/$side")
      .filter(_.startsWith("v=")).sorted
      .map(d => s"$outDir/$side/$d")
    dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Number of sidecar versions currently folded at read time (1 after
    * a build; +1 per append until a rewrite compacts them).
    */
  def sideVersionCount(spark: SparkSession, outDir: String): Long =
    graft.core.ArtifactIO.list(spark, s"$outDir/stats").count(_.startsWith("v=")).toLong

  /** The stats sidecar with versions FOLDED by merge kind (count → sum,
    * zone map → min/max) — one row per cluster, metadata scale.
    */
  def stats(spark: SparkSession, outDir: String): DataFrame = {
    val u = sideUnion(spark, outDir, "stats")
    val valCols = u.columns.filterNot(_ == "cluster").toSeq
    val aggs = valCols.map {
      case c if c == "n_rows" => sum(c).as(c)
      case c if c.startsWith("min_") => min(c).as(c)
      case c if c.startsWith("max_") => max(c).as(c)
      case c => sys.error(s"unknown stats column $c")
    }
    u.groupBy("cluster").agg(aggs.head, aggs.tail: _*)
  }

  /** Clusters whose [min, max] zone for `rangeCol` overlaps [lo, hi] —
    * a driver-side read of the |files|-row stats table (the manifest
    * pattern: bounded by file count, not data volume).
    */
  def selectRange(spark: SparkSession, outDir: String, rangeCol: String,
      lo: Long, hi: Long): Seq[Long] =
    stats(spark, outDir)
      .filter(col(s"min_$rangeCol") <= hi && col(s"max_$rangeCol") >= lo)
      .select(col("cluster").cast("long"))
      .collect().map(_.getLong(0)).toSeq.sorted

  /** Clusters whose bloom admits hash `h`: both probe bits present.
    * Driver-side over the bloom sidecar (≤ versions × |files| × Words
    * rows; the probe touches exactly the two words each probe lands
    * in). A bit present in ANY version row is present in the bit-or
    * fold, so the probe reads the version union directly — no merge
    * materialization.
    */
  def selectPoint(spark: SparkSession, outDir: String, h: Long): Seq[Long] = {
    val hits = Seq(0, 1).map { j =>
      val bp = bitposScala(h, j)
      val (w, b) = (bp / WordBits, bp % WordBits)
      sideUnion(spark, outDir, "bloom")
        .filter(col("word") === w && (col("mask").bitwiseAND(lit(1L << b))) =!= 0L)
        .select(col("cluster").cast("long"))
        .collect().map(_.getLong(0)).toSet
    }
    (hits.head intersect hits(1)).toSeq.sorted
  }

  /** Read ONLY the selected clusters: the `isin` lands in the scan's
    * PartitionFilters, so unselected directories are never opened
    * (plan- and metric-asserted in SkippingIndexSpec).
    */
  def readClusters(spark: SparkSession, outDir: String, ids: Seq[Long]): DataFrame =
    spark.read.parquet(s"$outDir/data")
      .filter(col("cluster").isin(ids: _*))

  // ------------------------------------------------------------------
  // PARTITION-SPEC EVOLUTION (the Iceberg table-evolution contract):
  // a table root holds one complete skipping index per layout
  // generation under `spec=<id>/`. Evolving the spec = writing new
  // data under a NEW spec id — history is never rewritten (zero data
  // movement), and the directory listing is the spec manifest, exactly
  // like the sidecars' version dirs. Old specs retire as their files
  // age out or compaction rewrites them under the current spec.
  // ------------------------------------------------------------------

  /** Write `df` as layout generation `specId` of the multi-spec table
    * at `outDir` (a standard [[build]] under `spec=<id>/`). The caller
    * picks the generation's own cluster function — that is the point
    * of evolution.
    */
  def buildSpec(df: DataFrame, outDir: String, specId: Long, clusterCol: String,
      rangeCols: Seq[String], bloomCol: String): Unit =
    build(df, s"$outDir/spec=$specId", clusterCol, rangeCols, bloomCol)

  /** The live layout generations of a multi-spec table, oldest first. */
  def liveSpecs(spark: SparkSession, outDir: String): Seq[Long] =
    graft.core.ArtifactIO.list(spark, outDir).filter(_.startsWith("spec="))
      .map(_.stripPrefix("spec=").toLong).sorted

  /** Range read ACROSS every live layout generation: each spec prunes
    * from its OWN |files|-row zone-map sidecar, each admitted set
    * drives its own PartitionFilters scan, and the union (tagged with
    * `spec_id`) is exactly the predicate's rows — the reader never
    * knows the layout changed. Plan cost: one metadata consultation
    * per live spec; scan cost: admitted directories only.
    */
  def readRangeAcrossSpecs(spark: SparkSession, outDir: String, rangeCol: String,
      lo: Long, hi: Long): DataFrame =
    liveSpecs(spark, outDir).map { id =>
      val root = s"$outDir/spec=$id"
      readClusters(spark, root, selectRange(spark, root, rangeCol, lo, hi))
        .filter(col(rangeCol).between(lo, hi))
        .withColumn("spec_id", lit(id))
    }.reduce(_ unionByName _)
}
