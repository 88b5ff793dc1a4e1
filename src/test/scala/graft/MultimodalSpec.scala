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

  test("frames reassemble to the original payload and sample every k-th") {
    import org.apache.spark.sql.functions._
    val m = Multimodal.attachBinary(docs.limit(20))
    val framed = Multimodal.frames(m, frameBytes = 16)
    // reassembly: concat frames in order == original bytes
    val rebuilt = framed.groupBy("media_id")
      .agg(sort_array(collect_list(struct(col("frame_no"), col("frame")))).as("fs"))
      .select(col("media_id"), expr("array_join(transform(fs, f -> string(f.frame)), '')").as("txt"))
      .as[(Long, String)].collect().toMap
    val original = docs.limit(20).select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(rebuilt == original)
    // sampling keeps ceil(n/k) frames per doc
    val total = framed.count()
    val sampled = Multimodal.sampleFrames(framed, 3).count()
    assert(sampled >= total / 3 && sampled <= total / 3 + 20)
  }

  test("empty payload yields zero frames, not a descending phantom pair") {
    import org.apache.spark.sql.functions._
    val one = Seq((1L, "", 42L, "abc")).toDF("a", "b", "c", "d")
      .select(col("a").as("doc_id"), col("b").as("text"))
    val m = Multimodal.attachBinary(one)
    assert(m.head().getStruct(2).getLong(1) == 0L, "sanity: payload must be empty")
    assert(Multimodal.frames(m, frameBytes = 16).count() == 0)
  }

  test("checksum matches a driver-side recompute") {
    val row = Multimodal.extractFeatures(Multimodal.attachBinary(docs.limit(1))).head()
    val text = docs.limit(1).select("text").as[String].head()
    assert(row.checksum == Multimodal.FakeDecoder.checksum(text.getBytes("UTF-8")))
    assert(row.feature.length == 4)
  }
}
