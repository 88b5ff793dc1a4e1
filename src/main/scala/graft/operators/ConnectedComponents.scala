package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * operator that turns near-duplicate PAIRS into duplicate CLUSTERS
  * (every member labeled with the smallest id reachable from it), so a
  * pipeline can keep one representative per group.
  *
  * Algorithm: every node starts labeled with its own id; each round,
  * a node's label becomes min(own, neighbors' labels); stop when no
  * label changes. Convergence in graph-diameter rounds — near-dup
  * clusters are dense and shallow, so typically 2–4 rounds. Each round
  * is one shuffle join on node id (never an edge-pair blow-up), and the
  * label frame is localCheckpoint()ed so lineage doesn't grow with the
  * iteration count — the standard BSP formulation. For adversarially
  * deep graphs (long chains) the doubling variants (Hash-to-Min /
  * small-star large-star, Kiveris et al. 2014) bound rounds by
  * O(log d); the per-round join shape below is unchanged.
  *
  * Deterministic: min is order-independent, so labels do not depend on
  * partitioning (spec'd), and the DuckDB oracle recomputes them with a
  * recursive reachability CTE.
  */
object ConnectedComponents {
  /** Labels every node of the undirected edge set (srcCol, dstCol) with
    * the minimum node id in its component. Output: (node, cluster).
    * Only nodes appearing in at least one edge are labeled.
    *
    * Throws IllegalStateException if labels have not converged after
    * `maxIter` rounds (a component with diameter > maxIter) — partially
    * propagated labels are wrong answers and must never be returned
    * silently. The returned frame is a materialized localCheckpoint;
    * superseded per-round checkpoints are unpersisted as the loop
    * advances, so executor storage stays O(|nodes|), not O(iters·|nodes|).
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .union(edges.select(col(dstCol).as("__s"), col(srcCol).as("__d")))
      .distinct()
      .localCheckpoint()
    // labelsCp is always the round's materialized checkpoint — kept
    // separate from the projected view so it can be unpersisted once the
    // next round's checkpoint exists.
    var labelsCp = sym.select(col("__s").as("node")).distinct()
      .withColumn("cluster", col("node"))
      .localCheckpoint()
    var labels = labelsCp
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // min label over each node's neighborhood, joined on the node id
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "__d"), Seq("__d"))
        .groupBy(col("__s").as("node"))
        .agg(min("cluster").as("__nmin"))
      val updated = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("cluster"), coalesce(col("__nmin"), col("cluster"))).as("cluster"),
          (col("__nmin") < col("cluster")).as("__chg"))
        .localCheckpoint() // eager: materialized before the old one is dropped
      changed = updated.filter(col("__chg")).count()
      unpersistCheckpoint(labelsCp)
      labelsCp = updated
      labels = updated.drop("__chg")
      iter += 1
    }
    unpersistCheckpoint(sym)
    if (changed > 0) {
      unpersistCheckpoint(labelsCp)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing) — raise maxIter for graphs of diameter > $maxIter")
    }
    labels
  }

  /** Frees the block-manager storage behind a localCheckpoint()ed frame.
    * Dataset.unpersist only covers cacheManager entries, not the RDD a
    * checkpoint pins, so reach through the LogicalRDD leaf instead.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
