package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.VectorExpressions.{dotF32, normF32}


/** Similarity search over an `ArrayType(FloatType)` embedding column
  * (SURVEY.md §2.C).
  *
  * Baseline: brute-force cosine — a broadcast of the (small) query set
  * against a full scan; per-partition top-k then a global merge, which is
  * exactly what `orderBy.limit` / a row_number window compiles to under
  * AQE. Embarrassingly parallel; at 100 TB it is bound by scan bandwidth.
  *
  * Scale path: [[SignRandomProjectionLsh]] — deterministic random-
  * hyperplane buckets so candidate generation shuffles on a small bucket
  * id; exact cosine re-ranks within probed buckets.
  */
object Similarity {
  /** Exact top-k cosine neighbors for every vector in `queries`
    * (a small DataFrame of (query_id, query_vec)); excludes self-matches
    * by id. Output: query_id, vec_id, cosine_sim (rounded for stable
    * cross-engine ordering), rnk.
    */
  def knnJoin(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Precompute each side's norm once before the join — cosine inside the
    // pair loop then costs a single dot product, not three.
    val e = embeddings.withColumn("__n", normF32(col("embedding")))
    val q = queries.withColumn("__qn", normF32(col("query_vec")))
    val sim = e
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotF32(col("embedding"), col("query_vec")) / (col("__n") * col("__qn")), 6)
          .as("cosine_sim"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("vec_id"))
    sim
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** knnJoin re-expressed with the custom top-k aggregate
    * (o.a.s.sql.graft.TopKAgg): map-side bounded heaps mean the shuffle
    * carries O(queries × k) rows per partition instead of the whole
    * similarity matrix — the formulation that survives a 100× scale-up.
    * Identical results to [[knnJoin]] (same score rounding, same
    * tie-break by vec_id).
    */
  def knnJoinAgg(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val e = embeddings.withColumn("__n", normF32(col("embedding")))
    val q = queries.withColumn("__qn", normF32(col("query_vec")))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotF32(col("embedding"), col("query_vec")) / (col("__n") * col("__qn")), 6)
          .as("cosine_sim"))
      .groupBy("query_id")
      .agg(org.apache.spark.sql.graft.TopKAgg.topk(col("cosine_sim"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("__r", "__kv")))
      .select(col("query_id"),
        col("__kv.id").as("vec_id"),
        col("__kv.score").as("cosine_sim"),
        (col("__r") + 1).cast("long").as("rnk"))
  }

  /** Deterministic hyperplanes for sign-random-projection LSH: gaussian
    * components from a fixed-seed PRNG, so bucket ids are stable across
    * runs while the planes are properly isotropic (a structured/low-
    * discrepancy grid gives correlated planes and poor recall).
    */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(42)
    Array.fill(numPlanes, dim)(rng.nextGaussian())
  }

  /** Bucket id = sign bits of the dot products with `numPlanes`
    * hyperplanes. Pure column arithmetic — stays in codegen.
    */
  def bucketId(embCol: org.apache.spark.sql.Column, planes: Array[Array[Double]]): org.apache.spark.sql.Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.map(x => lit(x.toFloat)): _*)
      when(dotF32(embCol, planeCol) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k for the query vectors: candidates = vectors whose bucket is
    * within Hamming distance `probeHamming` of the query's bucket, then
    * exact cosine re-rank. Recall is tunable via numPlanes/probeHamming;
    * the shuffle key is the small bucket id, never the vector.
    */
  def annLshTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
      numPlanes: Int = 6, probeHamming: Int = 2, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val emb = embeddings.withColumn("bucket", bucketId(col("embedding"), planes))
    val q = queries.withColumn("qbucket", bucketId(col("query_vec"), planes))
    // All bucket ids within the probe radius of qbucket (XOR popcount).
    val probed = emb
      .withColumn("__n", normF32(col("embedding")))
      .join(broadcast(q.withColumn("__qn", normF32(col("query_vec")))),
        expr(s"bit_count(bucket ^ qbucket) <= $probeHamming") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dotF32(col("embedding"), col("query_vec")) / (col("__n") * col("__qn")), 6)
          .as("cosine_sim"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine_sim").desc, col("vec_id"))
    probed.withColumn("rnk", row_number().over(w).cast("long")).filter(col("rnk") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    * Brute force all-pairs at test scale; the LSH bucket join above is the
    * 100 TB candidate-generation path for the same semantics.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val withNorm = embeddings
      .select(col("vec_id"), col("embedding"), normF32(col("embedding")).as("__n"))
      .persist()
    val a = withNorm.select(col("vec_id").as("vec_id_a"), col("embedding").as("ea"), col("__n").as("__na"))
    val b = withNorm.select(col("vec_id").as("vec_id_b"), col("embedding").as("eb"), col("__n").as("__nb"))
    a.join(b, col("vec_id_a") < col("vec_id_b"))
      .select(col("vec_id_a"), col("vec_id_b"),
        round(dotF32(col("ea"), col("eb")) / (col("__na") * col("__nb")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
