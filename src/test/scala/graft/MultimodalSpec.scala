package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.core.Tables(spark, sf("sf0.001"), "documents")

  test("attachBinary preserves byte length in metadata") {
    val m = Multimodal.attachBinary(docs)
    val bad = m.filter(org.apache.spark.sql.functions.expr("meta.n_bytes <> length(media)")).count()
    assert(bad == 0)
    assert(m.count() == docs.count())
  }

  test("extractFeatures is deterministic and row-preserving") {
    val m = Multimodal.attachBinary(docs.limit(50))
    val f1 = Multimodal.extractFeatures(m).collect().map(x => x.media_id -> x.checksum).toMap
    val f2 = Multimodal.extractFeatures(m).collect().map(x => x.media_id -> x.checksum).toMap
    assert(f1 == f2 && f1.size == 50)
  }

  test("checksum matches a driver-side recompute") {
    val row = Multimodal.extractFeatures(Multimodal.attachBinary(docs.limit(1))).head()
    val text = docs.limit(1).select("text").as[String].head()
    assert(row.checksum == Multimodal.FakeDecoder.checksum(text.getBytes("UTF-8")))
    assert(row.feature.length == 4)
  }
}
