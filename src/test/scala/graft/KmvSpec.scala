package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExtensions, KmvAgg}

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val D = 1000000007L

  test("kmv keeps the k smallest DISTINCT values, ascending") {
    val df = Seq(5L, 3L, 9L, 3L, 1L, 9L, 7L, 1L).toDF("h")
    val arr = df.agg(KmvAgg.kmv(col("h"), 4).as("a")).head().getSeq[Long](0)
    assert(arr == Seq(1L, 3L, 5L, 7L), "duplicates must count once; order ascending")
  }

  test("fewer than k distinct values: the sketch IS the distinct set") {
    val df = Seq(2L, 2L, 8L, 8L, 8L).toDF("h")
    val arr = df.agg(KmvAgg.kmv(col("h"), 100).as("a")).head().getSeq[Long](0)
    assert(arr == Seq(2L, 8L))
  }

  test("sketch is partition-invariant (lossless bottom-k merge)") {
    val rng = new scala.util.Random(31)
    val vals = Seq.fill(5000)(rng.nextLong().abs % D)
    val expect = vals.distinct.sorted.take(64)
    for (p <- Seq(1, 7, 32)) {
      val arr = vals.toDF("h").repartition(p)
        .agg(KmvAgg.kmv(col("h"), 64).as("a")).head().getSeq[Long](0)
      assert(arr == expect, s"partitioning $p changed the sketch")
    }
  }

  test("estimate lands within the ~1/sqrt(k) error band of the truth") {
    val rng = new scala.util.Random(47)
    val n = 20000
    val vals = Iterator.continually(rng.nextLong().abs % D).distinct.take(n).toSeq
    val k = 256
    val arr = vals.toDF("h").agg(KmvAgg.kmv(col("h"), k).as("a")).head().getSeq[Long](0)
    val est = (k - 1).toDouble * D / arr(k - 1)
    assert(math.abs(est - n) / n < 4.0 / math.sqrt(k), // 4 sigma ≈ 25 %
      s"estimate $est too far from true distinct count $n")
  }

  test("kmv_sketch is callable from SQL") {
    GraftExtensions.register(spark)
    Seq(5L, 3L, 9L, 3L).toDF("h").createOrReplaceTempView("kmv_in")
    val arr = spark.sql("SELECT kmv_sketch(h, 2) AS a FROM kmv_in").head().getSeq[Long](0)
    assert(arr == Seq(3L, 5L))
  }

  test("kmv_sketch accepts a BIGINT literal k and rejects non-literal / non-integral k clearly") {
    GraftExtensions.register(spark)
    Seq(5L, 3L, 9L, 3L).toDF("h").createOrReplaceTempView("kmv_in2")
    // widened literal folds fine — no opaque ClassCastException
    val arr = spark.sql("SELECT kmv_sketch(h, CAST(2 AS BIGINT)) AS a FROM kmv_in2")
      .head().getSeq[Long](0)
    assert(arr == Seq(3L, 5L))
    val nonFoldable = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_sketch(h, CAST(h AS INT)) FROM kmv_in2").collect()
    }
    assert(nonFoldable.getMessage.contains("foldable"), nonFoldable.getMessage)
    val wrongType = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_sketch(h, 'two') FROM kmv_in2").collect()
    }
    assert(wrongType.getMessage.contains("INT"), wrongType.getMessage)
  }
}
