package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExtensions, MinHashAgg}

import graft.dedup.Dedup
import graft.operators.Skew

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("Respread.ifCoarse widens an under-split frame and is a no-op on a wide one") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = spark.range(1000).coalesce(1).toDF("id")
    val spread = graft.operators.Respread.ifCoarse(narrow)
    assert(spread.rdd.getNumPartitions == target, "coarse input must be respread to parallelism")
    assert(spread.as[Long].collect().sorted.toSeq == (0L until 1000L), "respread must not change rows")
    val wide = spark.range(1000).repartition(target * 2).toDF("id")
    assert(graft.operators.Respread.ifCoarse(wide) eq wide, "well-split input must pass through untouched")
  }

  test("SQL functions dot_f32 / norm_f32 / minhash_agg register and evaluate") {
    GraftExtensions.register(spark)
    Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b").createOrReplaceTempView("v")
    val r = spark.sql("SELECT dot_f32(a, b) AS d, norm_f32(a) AS n FROM v").head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(5.0)) < 1e-12)
    val m = spark.sql("SELECT minhash_agg(h, 8) AS sig FROM (SELECT CAST(42 AS BIGINT) AS h)")
      .as[Seq[Long]].head()
    assert(m.length == 8 && m.forall(_ >= 0))
  }

  test("SQL functions tokenize_words / token_shingles / topk_agg register and evaluate") {
    GraftExtensions.register(spark)
    val toks = spark.sql("SELECT tokenize_words('It''s a test!') AS t")
      .as[Seq[String]].head()
    assert(toks == Seq("It", "s", "a", "test"))
    val sh = spark.sql("SELECT token_shingles(array('a','b','c'), 2, true) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c"))
    val top = spark.sql(
      """SELECT topk_agg(s, id, 2) AS t FROM VALUES (1.0D, 1L), (3.0D, 2L), (2.0D, 3L) AS v(s, id)""")
      .selectExpr("transform(t, x -> x.id) AS ids").as[Seq[Long]].head()
    assert(top == Seq(2L, 3L))
  }

  test("MinHashAgg signature equals the declarative wide-column formulation") {
    val docs = graft.core.Tables(spark, sf("sf0.001"), "documents")
    val sh = Dedup.shingleHashes(docs, 5).distinct()
    val viaAgg = Dedup.minHashSignaturesAgg(sh, 32)
      .as[(Long, Seq[Long])].collect().toMap
    val wide = Dedup.minHashSignatures(sh, 32)
    val cols = (0 until 32).map(k => col(s"mh_$k"))
    val viaWide = wide.select(col("doc_id"), array(cols: _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaAgg == viaWide)
  }

  test("array-form LSH bands equal wide-column bands") {
    val docs = graft.core.Tables(spark, sf("sf0.001"), "documents")
    val sh = Dedup.shingleHashes(docs, 5).distinct()
    val a = Dedup.lshBandsFromArray(Dedup.minHashSignaturesAgg(sh, 32), 4)
      .as[(Long, Int, String)].collect().toSet
    val b = Dedup.lshBands(Dedup.minHashSignatures(sh, 32), 4)
      .as[(Long, Int, String)].collect().toSet
    assert(a == b)
  }

  test("saltedCount equals plain groupBy count") {
    val docs = graft.core.Tables(spark, sf("sf0.001"), "documents")
    val salted = Skew.saltedCount(docs, "lang", 7).as[(String, Long)].collect().toMap
    val plain = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val docs = graft.core.Tables(spark, sf("sf0.001"), "documents").select("doc_id", "lang")
    val dims = Seq(("en", 1), ("de", 2), ("fr", 3), ("es", 4), ("zh", 5)).toDF("lang", "lang_id")
    val salted = Skew.saltedJoin(docs, dims, "lang", 5)
      .select("doc_id", "lang_id").as[(Long, Int)].collect().sorted.toSeq
    val plain = docs.join(dims, "lang")
      .select("doc_id", "lang_id").as[(Long, Int)].collect().sorted.toSeq
    assert(salted == plain)
  }
}
