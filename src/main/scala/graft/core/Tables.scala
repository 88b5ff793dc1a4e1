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

  /** `events.parquet` has shipped in two physical forms across driver
    * generations: TIMESTAMP(NANOS, isAdjustedToUTC=false) — which
    * Spark's parquet reader rejects natively, so it is read as raw
    * int64 nanos (legacy conf) and truncated to microseconds, exactly
    * what DuckDB does on ingest — and plain TIMESTAMP(MICROS), which
    * reads directly. Both normalize to TIMESTAMP_NTZ wall-clock values
    * so query results hash-match the DuckDB oracle either way. The
    * branch is on the FILE's schema, not a config, so a mixed-layout
    * lake (the 100 TB reality) reads correctly table by table.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        // integer division keeps full precision (a double roundtrip would
        // lose bits above 2^53); all epochs here are positive so trunc==floor.
        df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampNTZType => df
      // TIMESTAMP(MICROS) read without NTZ inference: UTC session tz makes
      // the cast a pure wall-clock relabel, value-identical to the NTZ path.
      case _ => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
}
