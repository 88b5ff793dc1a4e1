package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.{dotF32, normF32}

import graft.functions.VectorOps

/** The native codegen expressions must be bit-identical to the HOF
  * formulation (same fold order, double precision) — they share the
  * DuckDB oracle.
  */
class VectorExprSpec extends SparkSpec {

  private lazy val emb = graft.core.Tables(spark, sf("sf0.001"), "embeddings")

  test("DotF32 equals HOF dot bit-for-bit on real embeddings") {
    val a = emb.select(col("embedding").as("x"))
    val paired = a.crossJoin(emb.limit(3).select(col("embedding").as("y")))
    val diff = paired.select(
      (dotF32(col("x"), col("y")) - VectorOps.dot(col("x"), col("y"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff == 0)
  }

  test("NormF32 equals HOF norm bit-for-bit") {
    val diff = emb.select((normF32(col("embedding")) - VectorOps.norm(col("embedding"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff == 0)
  }

  test("null array propagates null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(dotF32(col("a"), col("b")).as("d"), normF32(col("b")).as("n")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("ragged arrays yield NULL, matching the zip_with null-padding chain") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f))).toDF("a", "b")
    val r = df.select(dotF32(col("a"), col("b")).as("native"),
      VectorOps.dot(col("a"), col("b")).as("hof")).head()
    assert(r.isNullAt(0) && r.isNullAt(1), s"both paths must be NULL on ragged input, got $r")
  }

  test("null elements yield NULL, matching the HOF poison semantics") {
    import spark.implicits._
    val df = Seq((Seq(Some(1f), None, Some(3f)), Seq(Some(4f), Some(5f), Some(6f))))
      .toDF("a", "b")
    val r = df.select(
      dotF32(col("a"), col("b")).as("nd"), VectorOps.dot(col("a"), col("b")).as("hd"),
      normF32(col("a")).as("nn"), VectorOps.norm(col("a")).as("hn")).head()
    assert((0 until 4).forall(r.isNullAt), s"all four must be NULL on a null element, got $r")
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val d = df.select(dotF32(col("a"), col("b"))).as[Double].head()
    assert(d == 32.0)
    val n = df.select(normF32(col("a"))).as[Double].head()
    assert(math.abs(n - math.sqrt(14.0)) < 1e-12)
  }

  test("packed sign-bit Hamming (q208's screen) equals the per-dim disagreement count") {
    // The engine screens on bit_count(sig XOR qsig) over the 64-bit
    // packed sign signature; the oracle counts per-dimension sign
    // disagreements. Pin the identity on the real corpus: every pair
    // among the first 25 vectors, including the sign-bit position
    // (dim 63 packs into shiftleft(1, 63) — the long's sign bit).
    val sig = expr(
      """aggregate(zip_with(embedding, sequence(0, 63),
        |            (x, i) -> IF(x > CAST(0.0 AS FLOAT),
        |                         shiftleft(CAST(1 AS BIGINT), i),
        |                         CAST(0 AS BIGINT))),
        |          CAST(0 AS BIGINT), (acc, b) -> acc | b)""".stripMargin)
    val e = graft.core.Tables(spark, sf("sf0.001"), "embeddings")
      .filter(col("vec_id") < 25)
      .select(col("vec_id"), col("embedding"), sig.as("sig"))
    val pairs = e.toDF("ia", "va", "sa")
      .join(e.toDF("ib", "vb", "sb"), col("ia") < col("ib"))
      .select(
        expr("CAST(bit_count(sa ^ sb) AS BIGINT)").as("packed"),
        expr("""aggregate(zip_with(va, vb,
              |  (x, y) -> IF((x > CAST(0.0 AS FLOAT)) != (y > CAST(0.0 AS FLOAT)),
              |               CAST(1 AS BIGINT), CAST(0 AS BIGINT))),
              |  CAST(0 AS BIGINT), (a, b) -> a + b)""".stripMargin).as("perdim"))
      .collect()
    assert(pairs.length == 25 * 24 / 2)
    pairs.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"packed popcount ${r.getLong(0)} != per-dim count ${r.getLong(1)}"))
    // and the signature really uses all 64 bits on this corpus
    val usedHigh = e.filter(col("sig") < 0L).count() // bit 63 set => negative long
    assert(usedHigh > 0, "fixture never sets the sign bit — weaken of the test")
  }
}
