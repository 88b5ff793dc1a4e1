package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Binary-column plumbing (SURVEY.md §2.C multimodal): payloads are
  * opaque `binary` columns with typed metadata alongside. The full
  * decode/feature pipeline (with the stubbed decoder) lives in
  * graft.multimodal; this query exercises the cross-engine-checkable
  * part — byte length and prefix of the binary payload.
  */
object QueriesBinary {
  def q28_binary_meta(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        // Truncate the BINARY to 8 bytes first, THEN hex — hexing the whole
        // payload would materialize a 2x-payload string per row just to keep
        // 16 chars. Spark's hex() is already uppercase; avoid upper() here —
        // Spark 4's collation-aware ICU upper-case path has a pathologically
        // slow static init (minutes of CPU on first use).
        hex(substring(col("text").cast("binary"), 1, 8)).as("head_hex"))
      .orderBy("doc_id")

  val q28Sql: String =
    """SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       upper(left(hex(encode(text)), 16)) AS head_hex
FROM documents ORDER BY doc_id"""
}
