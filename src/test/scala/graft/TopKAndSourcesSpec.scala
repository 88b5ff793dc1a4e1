package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sim.Similarity

class TopKAndSourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables(spark, sf("sf0.001"), "embeddings")

  test("knnJoinAgg (bounded-heap aggregate) equals the window formulation") {
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val viaAgg = Similarity.knnJoinAgg(emb, q, 5)
      .select("query_id", "vec_id", "cosine_sim", "rnk")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq
    val viaWindow = Similarity.knnJoin(emb, q, 5)
      .select("query_id", "vec_id", "cosine_sim", "rnk")
      .as[(Long, Long, Double, Long)].collect().sorted.toSeq
    assert(viaAgg == viaWindow)
  }

  test("csv sink/source round-trips a query result") {
    val out = Files.createTempDirectory("graft-csv").toString
    val counts = graft.queries.QueriesText.q01_wordcount(spark, sf("sf0.001"))
    counts.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema("word string, cnt long").csv(out)
    assert(back.as[(String, Long)].collect().toMap == counts.as[(String, Long)].collect().toMap)
  }

  test("json sink/source round-trips a query result") {
    val out = Files.createTempDirectory("graft-json").toString
    val stats = graft.queries.QueriesText.q18_lang_stats(spark, sf("sf0.001"))
    stats.write.mode("overwrite").json(out)
    val back = spark.read.json(out).select("lang", "n_docs", "avg_chars", "avg_tokens")
    assert(back.as[(String, Long, Double, Double)].collect().toSet ==
      stats.as[(String, Long, Double, Double)].collect().toSet)
  }

  test("orc sink/source round-trips a query result") {
    val out = Files.createTempDirectory("graft-orc").toString
    val hist = graft.queries.QueriesText.q06_token_length_hist(spark, sf("sf0.001"))
    hist.write.mode("overwrite").orc(out)
    assert(spark.read.orc(out).as[(Long, Long)].collect().toSet ==
      hist.as[(Long, Long)].collect().toSet)
  }
}
