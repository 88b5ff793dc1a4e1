package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** The reference's generic MapReduce surface, re-expressed on Datasets.
  *
  * The reference (see /root/reference/src/worker.rs:23-38) hard-codes a
  * `map: String => Vec<(String, String)>` and
  * `reduce: (String, Vec<String>) => (String, String)` pair and runs them
  * through a two-stage, hash-partitioned, file-based shuffle
  * (worker.rs:96-154) driven by a coordinator state machine
  * (coordinator.rs:14-111). Everything in that control plane — scheduling,
  * stage barrier, retries, shuffle transport — is Spark's DAGScheduler and
  * shuffle service here (SURVEY.md §1.4, §7.5), so this API is only the
  * data-transformation semantics.
  *
  * Differences from the reference, by design (SURVEY.md §7.4 trap 6):
  *  - reduce receives an Iterator, not a materialized Vec, so large key
  *    groups stream/spill instead of OOMing (worker.rs:118 materializes).
  *  - map-side partial aggregation is available through [[runAggregating]];
  *    the reference shuffles one record per occurrence (worker.rs:30-32).
  */
object MapReduce {
  /** Faithful shape: flatMap + groupByKey + mapGroups + bucket layout.
    * `numBuckets` mirrors the reference coordinator's `-n` flag
    * (main.rs:22-23): it fixes the output partition count.
    */
  def run[K: Encoder, V: Encoder](
      input: Dataset[String],
      mapFn: String => IterableOnce[(K, V)],
      reduceFn: (K, Iterator[V]) => (K, V),
      numBuckets: Int)(implicit kv: Encoder[(K, V)]): Dataset[(K, V)] = {
    input
      .flatMap(mapFn)
      .groupByKey(_._1)
      .mapGroups((k, it) => reduceFn(k, it.map(_._2)))
      // bucket-count fidelity for the OUTPUT layout (reference `-n` flag):
      // hash-partition the reduced result, after the aggregation shuffle.
      .repartition(numBuckets, org.apache.spark.sql.functions.col("_1"))
  }

  /** Whole-file map granularity — the reference's ACTUAL input contract:
    * one map task per file, and the map fn receives the ENTIRE file as a
    * single string (worker.rs:93 `fs::read_to_string`; coordinator.rs:216-224
    * creates one task per glob hit). [[run]]'s line granularity is only
    * equivalent for line-local map fns; a map fn needing cross-line
    * context (document stats, multi-line patterns) must come through
    * here. Files must individually fit an executor's memory — same
    * constraint as the reference worker.
    */
  def runWholeFiles[K: Encoder, V: Encoder](
      spark: SparkSession,
      inGlob: String,
      mapFn: String => IterableOnce[(K, V)],
      reduceFn: (K, Iterator[V]) => (K, V),
      numBuckets: Int)(implicit kv: Encoder[(K, V)]): Dataset[(K, V)] = {
    implicit val se: Encoder[String] = Encoders.STRING
    val wholeFiles: Dataset[String] =
      spark.createDataset(spark.sparkContext.wholeTextFiles(inGlob).values)
    run(wholeFiles, mapFn, reduceFn, numBuckets)
  }

  /** Scale-correct variant for associative+commutative reducers: combines
    * map-side before the shuffle (what the reference never does), so
    * shuffle volume is O(distinct keys), not O(records).
    */
  def runAggregating[K: Encoder, V: Encoder](
      input: Dataset[String],
      mapFn: String => IterableOnce[(K, V)],
      combine: (V, V) => V)(implicit kv: Encoder[(K, V)]): Dataset[(K, V)] =
    input
      .flatMap(mapFn)
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, combine(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }

  /** The reference's one built-in job: word count (worker.rs:23-38), over
    * any Dataset of lines. Tokenization matches worker.rs:26-31 —
    * case-sensitive `[A-Za-z]` runs only.
    */
  def wordCount(lines: Dataset[String], numBuckets: Int): Dataset[(String, Long)] = {
    implicit val e1: Encoder[(String, Long)] = Encoders.product[(String, Long)]
    implicit val e2: Encoder[String] = Encoders.STRING
    implicit val e3: Encoder[Long] = Encoders.scalaLong
    run[String, Long](
      lines,
      line => line.replaceAll("[^A-Za-z]", " ").split("\\s+").toSeq.filter(_.nonEmpty).map(w => (w, 1L)),
      (k, it) => (k, it.sum),
      numBuckets)
  }

  /** In-driver oracle for [[wordCount]] — a port of the reference's
    * verify.py:6-15, used by the test suite (t1 smoke shape).
    */
  def wordCountOracle(lines: Seq[String]): Map[String, Long] =
    lines
      .flatMap(_.replaceAll("[^A-Za-z]", " ").split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toMap
}
