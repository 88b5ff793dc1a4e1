package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables(spark, sf("sf0.001"), "documents")

  test("exact dedup: keep-first equals window formulation") {
    val a = Dedup.exactKeepFirst(docs, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    val b = Dedup.exactKeepFirstWindow(docs, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("exact dedup is idempotent") {
    val once = Dedup.exactKeepFirst(docs, "text", "doc_id")
    val twice = Dedup.exactKeepFirst(once, "text", "doc_id")
    assert(once.count() == twice.count())
  }

  test("exact dedup keeps the smallest id among duplicates") {
    val df = Seq((5L, "x"), (2L, "x"), (9L, "y")).toDF("doc_id", "text")
    val kept = Dedup.exactKeepFirst(df, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(2L, 9L)))
  }

  test("minhash LSH near-dup agrees with exact inverted-index jaccard at tau=0.8") {
    val lsh = Dedup.minHashNearDup(docs, 5, 0.8)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, 5, 0.8)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("simhash: near-identical docs get close fingerprints, disjoint docs do not collide") {
    val df = Seq(
      (1L, "spark query plan join filter scan data table row column"),
      (2L, "spark query plan join filter scan data table row value"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val fp = Dedup.simHash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
  }
}
