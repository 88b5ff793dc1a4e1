package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the configuration every entry point shares.
  *
  * Conventions (see SURVEY.md §7, BASELINE.md):
  *  - UTC session timezone so timestamp results hash-match the DuckDB oracle.
  *  - shuffle partitions sized to the local core count, not the default 200 —
  *    at cluster scale this is the knob you size to data volume instead.
  *  - AQE on: runtime coalescing of shuffle partitions and skew-join splitting
  *    are the 100 TB safety nets for the static choices made here.
  */
object Sessions {
  def local(app: String, cores: String = defaultCores): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Let AQE re-optimize CACHED plans too (off by default): a persisted
      // micro-batch/artifact frame otherwise materializes with the raw
      // shuffle-partition count, and every write from it emits that many
      // near-empty files (measured: q190's raw/curated batch dirs were 32
      // tiny part-files each — file-create/commit bound, guide §6).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      // SPARK_GRAFT_UI=1 exposes the UI/REST API for stage-level
      // diagnosis (task counts per stage, shuffle volumes) — off by
      // default so bench runs carry no server overhead.
      .config("spark.ui.enabled", sys.env.getOrElse("SPARK_GRAFT_UI", "0") == "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
}
