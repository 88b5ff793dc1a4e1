package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, expressed
  * with Spark's higher-order functions (`zip_with`/`aggregate`) so the
  * whole computation stays inside whole-stage codegen — no UDF
  * serialization boundary, no Encoder round-trip.
  *
  * All arithmetic is promoted to Double before accumulating and folds
  * left-to-right, matching the DuckDB oracle's evaluation order so both
  * engines produce bit-identical sums on identical inputs.
  */
object VectorOps {
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0),
      (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
