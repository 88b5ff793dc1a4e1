package graft

import java.nio.file.Files

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Malformed-record semantics on the text-based sources — the reference's
  * A8 rule ("a malformed record is skipped, never a task failure",
  * worker.rs:128-131) generalized to the CSV/JSON ingestion paths:
  * PERMISSIVE nulls-and-captures, DROPMALFORMED skips, FAILFAST raises.
  */
class SourcesRobustnessSpec extends SparkSpec {

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-robust").toFile
    val f = new java.io.File(dir, name)
    Files.writeString(f.toPath, lines.mkString("\n"))
    f.getAbsolutePath
  }

  private val csvSchema = "id LONG, word STRING, n LONG"

  test("CSV PERMISSIVE: malformed rows null out and are captured, valid rows survive") {
    val path = writeLines("docs.csv", Seq(
      "1,alpha,10",
      "2,beta,not_a_number", // bad long
      "3,gamma,30"))
    val df = spark.read
      .schema(csvSchema + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .cache()
    try {
      assert(df.count() == 3, "PERMISSIVE keeps every input row")
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 1,
        "exactly the malformed row is captured")
      assert(df.filter(col("n").isNotNull).count() == 2,
        "valid rows parse fully")
    } finally df.unpersist()
  }

  test("CSV DROPMALFORMED: the A8 skip rule — bad rows vanish, job succeeds") {
    val path = writeLines("docs.csv", Seq(
      "1,alpha,10",
      "2,beta,not_a_number",
      "garbage line with no commas at all,",
      "3,gamma,30"))
    val df = spark.read.schema(csvSchema)
      .option("mode", "DROPMALFORMED").csv(path)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
      "only fully-parsed rows survive DROPMALFORMED")
  }

  test("CSV FAILFAST: a malformed row is a loud job failure, not silent data loss") {
    val path = writeLines("docs.csv", Seq("1,alpha,10", "2,beta,not_a_number"))
    val df = spark.read.schema(csvSchema).option("mode", "FAILFAST").csv(path)
    intercept[SparkException] { df.collect() }
  }

  test("JSON PERMISSIVE: broken lines become corrupt records, valid lines parse") {
    val path = writeLines("docs.jsonl", Seq(
      """{"id": 1, "word": "alpha", "n": 10}""",
      """{"id": 2, "word": "beta", "n": """, // truncated JSON
      """not json at all""",
      """{"id": 3, "word": "gamma", "n": 30}"""))
    val df = spark.read
      .schema(csvSchema + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    try {
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 2,
        "both broken lines are captured")
      assert(df.filter(col("id").isNotNull).count() == 2,
        "both valid lines parse")
    } finally df.unpersist()
  }

  test("JSON DROPMALFORMED: bad lines are skipped like the reference's malformed KV lines") {
    val path = writeLines("docs.jsonl", Seq(
      """{"id": 1, "word": "alpha", "n": 10}""",
      """not json""",
      """{"id": 3, "word": "gamma", "n": 30}"""))
    val df = spark.read.schema(csvSchema).option("mode", "DROPMALFORMED").json(path)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("q86/q87 roundtrips are lossless on the real table") {
    val src = graft.core.Tables(spark, sf("sf0.001"), "documents")
    val expected = src.agg(count(lit(1)), sum("n_chars"), sum(length(col("text")))).collect()(0)
    val viaCsv = graft.queries.QueriesSources.q86_csv_roundtrip(spark, sf("sf0.001"))
      .agg(sum("n_docs"), sum("total_chars"), sum("total_text_len")).collect()(0)
    val viaJson = graft.queries.QueriesSources.q87_jsonl_roundtrip(spark, sf("sf0.001"))
      .agg(sum("n_docs"), sum("total_chars"), sum("total_text_len")).collect()(0)
    assert(viaCsv == expected, s"csv roundtrip drifted: $viaCsv vs $expected")
    assert(viaJson == expected, s"jsonl roundtrip drifted: $viaJson vs $expected")
  }
}
