package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, so callers should NOT cache or
  * materialize here; each query declares exactly what it needs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** `events.parquet` stores TIMESTAMP(NANOS, isAdjustedToUTC=false),
    * which Spark's parquet reader rejects natively. Read the raw int64
    * nanos (legacy conf) and truncate to microseconds — exactly what
    * DuckDB does on ingest — keeping TIMESTAMP_NTZ semantics so both
    * engines see identical wall-clock values.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      // integer division keeps full precision (a double roundtrip would
      // lose bits above 2^53); all epochs here are positive so trunc==floor.
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
}
