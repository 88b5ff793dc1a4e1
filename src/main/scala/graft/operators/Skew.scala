package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for shuffles whose key distribution is heavy-
  * tailed (SURVEY.md scale notes; AQE's skew-join split covers sort-merge
  * joins at runtime, but salting is the explicit tool when one hot key
  * dominates an aggregation or a shuffled join).
  */
object Skew {
  /** Two-phase salted count: count per (key, salt) first — spreading a hot
    * key over `saltBuckets` reducers — then sum the partials per key.
    * Equivalent to groupBy(key).count() for any distribution.
    */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int): DataFrame =
    df
      .withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("cnt"))

  /** Salted equi-join of a skewed LEFT side against a small-ish RIGHT
    * side: the left side gets a random salt in [0, saltBuckets); the right
    * side is replicated once per salt value, so each hot left key spreads
    * over `saltBuckets` shuffle partitions. Use when the right side is too
    * big to broadcast but small enough to replicate `saltBuckets` times.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
