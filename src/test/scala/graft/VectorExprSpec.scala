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
}
