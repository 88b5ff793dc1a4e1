package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.{IvfIndex, Similarity}

/** Similarity-search queries over the embeddings table (SURVEY.md §2.C-D
  * Q17 and extensions Q20, Q26–Q27).
  *
  * Cosine is computed in double precision with left-to-right accumulation
  * in both engines, then rounded to 6 decimals BEFORE any ordering or
  * thresholding so cross-engine sort order is stable.
  */
object QueriesSim {
  private def emb(s: SparkSession, dir: String) = Tables(s, dir, "embeddings")

  /** DuckDB fragment: round(cosine(a, b), 6) for two double-list exprs. */
  private def cosSql(a: String, b: String): String =
    raw"""round(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))
 / (sqrt(list_sum(list_transform($a, x -> x * x))) * sqrt(list_sum(list_transform($b, x -> x * x)))), 6)"""

  def q17_cosine_knn(s: SparkSession, dir: String): DataFrame = {
    val queries = emb(s, dir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    Similarity.knnJoin(emb(s, dir), queries, k = 10)
      .select(col("vec_id"), col("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("vec_id"))
  }

  val q17Sql: String =
    raw"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
s AS (SELECT e.vec_id, ${cosSql("e.v", "qv")} AS cosine_sim FROM e, q WHERE e.vec_id <> 0)
SELECT vec_id, cosine_sim FROM s ORDER BY cosine_sim DESC, vec_id LIMIT 10"""

  /** Embedding-cosine near-duplicate pairs (brute force at test scale;
    * see Similarity.annLshTopK for the bucketed 100 TB path).
    */
  def q20_embedding_neardup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(emb(s, dir), threshold = 0.45)
      .orderBy("vec_id_a", "vec_id_b")

  val q20Sql: String =
    raw"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
p AS (SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, ${cosSql("a.v", "b.v")} AS cosine_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT vec_id_a, vec_id_b, cosine_sim FROM p WHERE cosine_sim >= 0.45 ORDER BY vec_id_a, vec_id_b"""

  /** Brute-force k-NN join: top-5 neighbors for each of the first 10
    * vectors — via the custom bounded-heap top-k aggregate (map-side
    * partial top-k; the shuffle carries only k rows per query per
    * partition, not the whole similarity matrix).
    */
  def q26_knn_join(s: SparkSession, dir: String): DataFrame = {
    val queries = emb(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    Similarity.knnJoinAgg(emb(s, dir), queries, k = 5)
      .select(col("query_id"), col("vec_id"), col("cosine_sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  val q26Sql: String =
    raw"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
s AS (SELECT q.query_id, e.vec_id, ${cosSql("e.v", "qv")} AS cosine_sim
      FROM e, q WHERE e.vec_id <> q.query_id),
r AS (SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM s)
SELECT query_id, vec_id, cosine_sim, rnk FROM r WHERE rnk <= 5 ORDER BY query_id, rnk"""

  /** ANN via sign-random-projection LSH buckets + exact re-rank within
    * probed buckets. Approximate by construction — no SQL oracle; the
    * test suite asserts recall ≥ 0.9 against the brute-force q17.
    */
  def q27_ann_lsh(s: SparkSession, dir: String): DataFrame = {
    val queries = emb(s, dir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    Similarity.annLshTopK(emb(s, dir), queries, k = 10)
      .select(col("query_id"), col("vec_id"), col("cosine_sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** IVF-style ANN (k-means cells + nprobe search) — the other classic
    * scale path next to LSH. Approximate: rows-only check + recall spec.
    */
  def q34_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val model = IvfIndex.train(e, k = 16, iters = 5)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    IvfIndex.annTopK(IvfIndex.assign(e, model), queries, model, k = 10, nprobe = 4)
      .orderBy("query_id", "rnk")
  }
}
