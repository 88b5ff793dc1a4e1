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

  // ---- HLL register sketch ----

  /** The declarative twin of HllAgg's register transition: idx = h mod
    * m, rho = w-bit leading-zero rank of h div m, registers = max per
    * idx with untouched registers 0 — what the q167 oracle replays.
    */
  private def registersTwin(hs: Seq[Long], p: Int): Seq[Int] = {
    val m = 1 << p
    val w = 30 - p
    val regs = new Array[Int](m)
    hs.filter(_ >= 0).foreach { h =>
      val idx = (h % m).toInt
      val q = h / m
      val rho = if (q == 0) w + 1 else w - (63 - java.lang.Long.numberOfLeadingZeros(q))
      if (rho > regs(idx)) regs(idx) = rho
    }
    regs.toSeq
  }

  test("hll registers match the integer-arithmetic twin and are partition-invariant") {
    val rng = new scala.util.Random(59)
    val vals = Seq.fill(8000)(rng.nextLong().abs % D)
    val want = registersTwin(vals, 9)
    for (p <- Seq(1, 7, 32)) {
      val got = vals.toDF("h").repartition(p)
        .agg(org.apache.spark.sql.graft.HllAgg.hll(col("h"), 9).as("r"))
        .head().getSeq[Int](0)
      assert(got == want, s"partitioning $p changed the registers")
    }
  }

  test("hll register merge across groups equals the sketch over the union") {
    // the rollup identity q167 leans on: max-merging per-group register
    // arrays IS the sketch of the concatenated input
    val rng = new scala.util.Random(61)
    val vals = Seq.tabulate(6000)(i => (i % 7, rng.nextLong().abs % D))
    val perGroup = vals.toDF("g", "h").groupBy("g")
      .agg(org.apache.spark.sql.graft.HllAgg.hll(col("h"), 9).as("regs"))
    val mergedRows = perGroup
      .select(posexplode(col("regs")).as(Seq("idx", "r")))
      .groupBy("idx").agg(max("r").as("r"))
      .orderBy("idx").select("r").as[Int].collect().toSeq
    assert(mergedRows == registersTwin(vals.map(_._2), 9))
  }

  test("hll estimate lands within the ~1.04/sqrt(m) error band; estimateCol matches the dyadic sum") {
    val rng = new scala.util.Random(67)
    val n = 30000
    val vals = Iterator.continually(rng.nextLong().abs % D).distinct.take(n).toSeq
    val df = vals.toDF("h")
      .agg(org.apache.spark.sql.graft.HllAgg.hll(col("h"), 9).as("regs"))
    val est = df.select(org.apache.spark.sql.graft.HllAgg.estimateCol(col("regs"), 9).as("e"))
      .head().getDouble(0)
    assert(math.abs(est - n) / n < 4.0 * 1.04 / math.sqrt(512.0), // 4 sigma ≈ 18 %
      s"estimate $est too far from true distinct count $n")
    // estimateCol's HOF fold == the plain scala dyadic sum (exactness)
    val regs = df.head().getSeq[Int](0)
    val ssum = regs.map(r => 1.0 / (1L << r)).sum
    val alpha = 0.7213 / (1.0 + 1.079 / 512.0)
    assert(est == alpha * 512.0 * 512.0 / ssum, "dyadic estimate must be exact, not approximately equal")
  }

  test("hll_sketch is callable from SQL") {
    GraftExtensions.register(spark)
    Seq(5L, 3L, 9L, 3L).toDF("h").createOrReplaceTempView("hll_in")
    val arr = spark.sql("SELECT hll_sketch(h, 4) AS a FROM hll_in").head().getSeq[Int](0)
    assert(arr.length == 16 && arr.sum > 0)
    assert(arr == registersTwin(Seq(5L, 3L, 9L, 3L), 4).map(identity))
  }
}
