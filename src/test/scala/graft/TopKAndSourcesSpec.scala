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

  test("TopKAgg ranks NaN scores like the window twin (NaN = largest, kept first)") {
    // The window formulation sorts NaN as the LARGEST double (descending
    // order ranks it first). The bounded heap must agree — a naive
    // `s > worst` comparison is false for NaN and silently drops it.
    import org.apache.spark.sql.expressions.Window
    val rows = Seq.tabulate(30)(i => (1L, i.toDouble / 10.0, i.toLong)) ++
      Seq((1L, Double.NaN, 100L), (1L, Double.NaN, 101L))
    val df = rows.toDF("g", "s", "id")
    val viaAgg = df.groupBy("g")
      .agg(org.apache.spark.sql.graft.TopKAgg.topk(col("s"), col("id"), 5).as("t"))
      .select(posexplode(col("t")).as(Seq("r", "kv")))
      .select(col("kv.id"), (col("r") + 1).cast("long").as("rnk"))
      .as[(Long, Long)].collect().sorted.toSeq
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    val viaWindow = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5).select("id", "rnk")
      .as[(Long, Long)].collect().sorted.toSeq
    val byRank = viaWindow.map { case (id, rnk) => rnk -> id }.toMap
    assert(byRank(1L) == 100L && byRank(2L) == 101L, "sanity: window ranks NaN first")
    assert(viaAgg == viaWindow)
  }

  test("TopKAgg ties -0.0 with 0.0 and breaks the tie by id, like SQL sort") {
    val df = Seq((1L, 0.0d, 5L), (1L, -0.0d, 3L), (1L, 1.0d, 9L)).toDF("g", "s", "id")
    val top = df.groupBy("g")
      .agg(org.apache.spark.sql.graft.TopKAgg.topk(col("s"), col("id"), 2).as("t"))
      .select(explode(col("t.id")).as("id")).as[Long].collect().toSeq
    // keep (1.0, 9) then the 0.0-tie resolved by id asc -> 3 (not by -0.0 < 0.0)
    assert(top == Seq(9L, 3L))
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
