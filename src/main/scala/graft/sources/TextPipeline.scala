package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Text

/** The reference's end-to-end file pipeline, Spark-first:
  * text-glob source (coordinator.rs:216 — one task per `*.txt` file;
  * Spark splits by line/block, a strict superset) → tokenize
  * (worker.rs:23-34) → count per word (worker.rs:36-38) → per-partition
  * sorted `"{word} {count}"` text sink (worker.rs:144-154, whose output
  * files are key-sorted via BTreeMap iteration).
  *
  * Atomic commit (the reference's temp-file+rename, worker.rs:107-114) is
  * Spark's FileCommitProtocol; bucket count (`-n`, main.rs:22) is the
  * repartition width.
  */
object TextPipeline {
  /** A1: text source. `path` may be a glob of `.txt` files. */
  def readLines(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** A2+A6+A7: tokenize + count, all codegen'd built-ins. */
  def wordCount(lines: Dataset[String]): DataFrame =
    lines
      .select(explode(Text.tokens(col("value"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** A9: one output file per bucket, `"{word} {count}"` lines, words
    * ascending within each file (per-bucket order, like the reference —
    * not a global total order).
    */
  def writeSortedText(counts: DataFrame, outDir: String, numBuckets: Int): Unit =
    counts
      .repartition(numBuckets, col("word"))
      .sortWithinPartitions("word")
      .select(concat_ws(" ", col("word"), col("cnt")))
      .write.mode("overwrite").text(outDir)

  /** The full job: glob → word count → sorted bucketed text files. */
  def run(spark: SparkSession, inGlob: String, outDir: String, numBuckets: Int): Unit =
    writeSortedText(wordCount(readLines(spark, inGlob)), outDir, numBuckets)

  /** Read back a result directory written by [[writeSortedText]] —
    * the shape verify.py:18-28 parses. A8 fidelity: any line that does
    * not split into exactly two fields is silently DROPPED, exactly like
    * the reference's intermediate-file parser (worker.rs:128-131) — not
    * surfaced as a row with a null count.
    */
  def readResult(spark: SparkSession, outDir: String): DataFrame =
    spark.read.textFile(outDir)
      .select(split(col("value"), " ").as("kv"))
      .filter(size(col("kv")) === 2)
      .select(col("kv").getItem(0).as("word"), col("kv").getItem(1).cast("long").as("cnt"))
}
