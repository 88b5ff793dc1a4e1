package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.{NearestCentroid, TopKAgg, VectorExpressions}

/** Product quantization (PQ) — the classic ANN *compression* path
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011) next to the pruning paths already in the engine (SRP-LSH
  * buckets, IVF cells): split the d-dim embedding into M subspaces of
  * d/M dims, learn a small per-subspace codebook (ksub centroids), and
  * store each vector as M small codes. A 64-dim float32 embedding
  * (256 bytes) becomes M = 8 bytes + one shared codebook.
  *
  * Scale shape: the query-time scan reads the CODES column only —
  * 32× less bandwidth than the raw vectors — and the corpus embedding
  * column is touched again only for the final exact re-rank of the k
  * winners per query. At 100 TB the ANN scan is bandwidth-bound, so
  * the compressed scan is the win; compute per row stays M·(d/M) = d
  * multiply-adds in this formulation (asymmetric distance: exact query
  * subvector vs quantized corpus subvector). The further at-scale
  * compute optimization — precompute each query's M×ksub distance
  * table once and turn the per-row work into M table lookups — needs
  * the bounded query batch driver-side (the IvfIndex.train sample
  * convention) and is documented rather than taken here so the whole
  * query stays a two-sided DataFrame plan.
  *
  * Deterministic end to end (the q34/q41 IVF convention): codebook
  * training is driver-side over the first sampleN vectors by vec_id
  * (init = the first ksub subvectors; optional fixed-count Lloyd
  * rounds), encoding is the native [[NearestCentroid]] argmin per
  * subspace (first-index ties), and ADC distances accumulate in
  * index order in doubles — all replayable in DuckDB SQL.
  */
object PqIndex {
  /** codebooks(m)(j) = the j-th centroid of subspace m (length d/M). */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def numSub: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def subDim: Int = codebooks(0)(0).length
  }

  /** Driver-side per-subspace k-means over a deterministic sample
    * (ordered by vec_id, ≤ sampleN rows — at 100 TB codebooks are
    * always trained on a bounded sample, never the corpus). iters = 0
    * keeps the init codebook (subvectors of the first ksub sample
    * vectors), which the SQL oracle can replay without a Lloyd loop.
    */
  def train(embeddings: DataFrame, numSub: Int, ksub: Int,
      iters: Int = 0, sampleN: Int = 2048): Model =
    trainFromSample(collectSample(embeddings, sampleN), numSub, ksub, iters)

  /** PQ over IVF-cell RESIDUALS (x − centroid[cell(x)]) — the faiss
    * IVF-PQ default: residual magnitudes are a fraction of raw vector
    * magnitudes, so a fixed code budget quantizes them far more finely.
    * The residual sample is computed driver-side in doubles (codebook
    * constants need no float rounding; the ENCODING input column is
    * float — the engine's storage type — and both engines replay that
    * cast explicitly).
    */
  def trainResiduals(embeddings: DataFrame, ivf: IvfIndex.Model, numSub: Int,
      ksub: Int, iters: Int = 0, sampleN: Int = 2048): Model = {
    val sample = collectSample(embeddings, sampleN)
    val res = sample.map { v =>
      val c = ivf.centroids(IvfIndex.nearestCentroidIdx(ivf.centroids, v))
      Array.tabulate(v.length)(i => v(i) - c(i))
    }
    trainFromSample(res, numSub, ksub, iters)
  }

  private def collectSample(embeddings: DataFrame, sampleN: Int): Array[Array[Double]] =
    embeddings
      .orderBy("vec_id").limit(sampleN)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))

  private def trainFromSample(sample: Array[Array[Double]], numSub: Int,
      ksub: Int, iters: Int): Model = {
    require(sample.length >= ksub, s"need at least $ksub sample vectors, got ${sample.length}")
    val dim = sample(0).length
    require(dim % numSub == 0, s"dim $dim not divisible into $numSub subspaces")
    val subDim = dim / numSub

    val codebooks = Array.tabulate(numSub) { m =>
      val sub = sample.map(v => v.slice(m * subDim, (m + 1) * subDim))
      var cb = sub.take(ksub).map(_.clone())
      (1 to iters).foreach { _ =>
        val sums = Array.fill(ksub, subDim)(0.0)
        val counts = new Array[Long](ksub)
        sub.foreach { v =>
          val c = nearestIdx(cb, v)
          counts(c) += 1
          var i = 0
          while (i < subDim) { sums(c)(i) += v(i); i += 1 }
        }
        cb = Array.tabulate(ksub) { c =>
          if (counts(c) == 0) cb(c) else sums(c).map(_ / counts(c))
        }
      }
      cb
    }
    Model(codebooks)
  }

  private def nearestIdx(cb: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      var d = 0.0
      var i = 0
      while (i < v.length) { val t = v(i) - cb(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The M per-subspace codes for one embedding column: each is the
    * native [[NearestCentroid]] argmin over that subspace's codebook
    * applied to the subvector slice (the |c|² − 2·e·c score with
    * first-index ties — exactly what the oracle replays). One narrow
    * array<int> column; at scale this is the materialized index
    * column and the raw embedding need not be read again.
    */
  def codesCol(emb: Column, model: Model): Column = {
    val sd = model.subDim
    array((0 until model.numSub).map { m =>
      NearestCentroid.nearest(slice(emb, m * sd + 1, sd), model.codebooks(m))
    }: _*)
  }

  /** Embeddings plus their `codes` column. */
  def encode(embeddings: DataFrame, model: Model): DataFrame =
    embeddings.withColumn("codes", codesCol(col("embedding"), model))

  /** The rounded ADC distance column: approximate squared distance from
    * `query_vec` to the quantized corpus vector behind `codes` =
    * Σ_m ‖q_m − codebook_m[code_m]‖², accumulated subspace-by-subspace
    * then component-by-component in doubles (fixed fold order both
    * engines replay). Codebook entries go through the same double→float
    * cast as [[NearestCentroid]]'s literals.
    */
  private def adcDist(model: Model): Column = {
    val sd = model.subDim
    val cbLit: IndexedSeq[Column] = (0 until model.numSub).map { m =>
      array(model.codebooks(m).map(entry =>
        array(entry.map(x => lit(x.toFloat)): _*)): _*)
    }
    val subDists: Seq[Column] = (0 until model.numSub).map { m =>
      val qSub = slice(col("query_vec"), m * sd + 1, sd)
      val cEntry = element_at(cbLit(m), element_at(col("codes"), m + 1) + 1)
      aggregate(
        zip_with(qSub, cEntry, (a, b) => {
          val d = a.cast("double") - b.cast("double")
          d * d
        }),
        lit(0.0),
        (acc, x) => acc + x)
    }
    round(subDists.foldLeft(lit(0.0))(_ + _), 6)
  }

  /** Rank ADC candidates by (distance asc, vec_id) through the
    * bounded-heap top-k aggregate — the shuffle carries k rows per
    * query per partition — then join ONLY the k winners back to the raw
    * embeddings for the exact rounded-cosine re-rank column.
    */
  private def rankAndRerank(candidates: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val top = candidates
      .groupBy("query_id")
      .agg(TopKAgg.topk(-col("adc_dist"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("__r", "__kv")))
      .select(col("query_id"), col("__kv.id").as("vec_id"),
        (-col("__kv.score")).as("adc_dist"),
        (col("__r") + 1).cast("long").as("rnk"))
    val c = corpus.select(col("vec_id"), col("embedding"),
      VectorExpressions.normF32(col("embedding")).as("__n"))
    val qn = queries.select(col("query_id"), col("query_vec"),
      VectorExpressions.normF32(col("query_vec")).as("__qn"))
    c.join(broadcast(top), Seq("vec_id"))
      .join(broadcast(qn), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("adc_dist"),
        round(VectorExpressions.dotF32(col("embedding"), col("query_vec"))
          / (col("__n") * col("__qn")), 6).as("cosine_sim"),
        col("rnk"))
  }

  /** Flat (exhaustive-codes) ADC top-k: every corpus row's codes are
    * scanned for every query — the compressed-scan baseline.
    */
  def adcTopK(encoded: DataFrame, queries: DataFrame, model: Model, k: Int): DataFrame =
    adcTopKSplit(encoded, encoded, queries, model, k)

  /** [[adcTopK]] with the codes table and the raw-embedding corpus as
    * SEPARATE inputs — the persisted-artifact shape: the compressed
    * codes table (M bytes/vector) is the scan side, and the full
    * embeddings are touched only to re-rank the k winners per query.
    */
  def adcTopKSplit(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
      model: Model, k: Int): DataFrame = {
    val candidates = codes
      .select(col("vec_id"), col("codes"))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adcDist(model).as("adc_dist"))
    rankAndRerank(candidates, corpus, queries, k)
  }

  /** Persist the PQ index artifacts: `$path/codebooks` holds
    * (m, j, centroid array<double>) — numSub×ksub rows, and
    * `$path/codes` holds the pure compressed index (vec_id,
    * codes array<int>) — the M-bytes-per-vector table an ADC scan
    * reads INSTEAD of the embeddings; raw vectors are only needed to
    * re-rank winners ([[adcTopKSplit]]). Doubles/ints round-trip
    * parquet bit-exactly, so a loaded index searches identically
    * (PqSpec pins saved == fresh).
    */
  def save(encoded: DataFrame, model: Model, path: String): Unit = {
    val spark = encoded.sparkSession
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (cb, m) =>
      cb.zipWithIndex.map { case (entry, j) => (m, j, entry.toSeq) }
    }.toSeq.toDF("m", "j", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    encoded.select("vec_id", "codes")
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Load a saved PQ index: (model, codes table). */
  def load(spark: SparkSession, path: String): (Model, DataFrame) = {
    val rows = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Int]("j"), r.getAs[Seq[Double]]("centroid").toArray))
    val byM = rows.groupBy(_._1)
    val codebooks = Array.tabulate(byM.size) { m =>
      val entries = byM(m).map(t => t._2 -> t._3).toMap
      Array.tabulate(entries.size)(entries)
    }
    (Model(codebooks), spark.read.parquet(s"$path/codes"))
  }

  /** The float-rounded residual of `emb` against its `cluster`'s IVF
    * centroid: zip_with(x, centroid, (a,b) → float(double(a)−double(b))).
    * Float is the engine's array storage type, and the cast is explicit
    * so the oracle replays it exactly (CAST(xd − cd AS REAL)).
    */
  def residualCol(emb: Column, cluster: Column, ivf: IvfIndex.Model): Column = {
    val centLit = array(ivf.centroids.map(c =>
      array(c.map(x => lit(x.toFloat)): _*)): _*)
    zip_with(emb, element_at(centLit, cluster + 1),
      (a, b) => (a.cast("double") - b.cast("double")).cast("float"))
  }

  /** Residual IVF-PQ search — the faiss default composition: the PQ
    * codes quantize each vector's RESIDUAL against its cell centroid
    * (train with [[trainResiduals]], encode the [[residualCol]]), and
    * at query time the ADC distance compares the QUERY's residual
    * against the probed cell to the candidate's residual codes.
    * Residual PQ beats raw-vector PQ exactly when the coarse cells are
    * tight (residual magnitude ≪ vector magnitude — clustered data,
    * trained centroids); on isotropic data with init-point cells the
    * residuals are LARGER than the vectors and it measurably loses
    * (q126's panel: 0.06 vs 0.26 recall@10) — quantify before
    * composing. Same plan shape as [[adcTopKIvf]]: keyed cell
    * equi-join, 8-byte code scan, exact re-rank of the winners against
    * the raw vectors.
    */
  def adcTopKIvfResidual(indexed: DataFrame, queries: DataFrame,
      ivf: IvfIndex.Model, pq: Model, k: Int, nprobe: Int): DataFrame = {
    val cellScores: Seq[Column] = ivf.centroids.toSeq.zipWithIndex.map { case (ctr, j) =>
      val cLit = array(ctr.map(x => lit(x.toFloat)): _*)
      struct((lit(ctr.map(x => x * x).sum) -
        lit(2.0) * VectorExpressions.dotF32(col("query_vec"), cLit)).as("s"),
        lit(j).as("c"))
    }
    // each probe row carries the query's residual AGAINST THAT CELL as
    // its ADC query vector
    val probes = queries
      .withColumn("__probe", explode(slice(array_sort(array(cellScores: _*)), 1, nprobe)))
      .withColumn("cluster", col("__probe.c"))
      .select(col("query_id"), col("cluster"),
        residualCol(col("query_vec"), col("cluster"), ivf).as("query_vec"))
    val candidates = indexed
      .select(col("vec_id"), col("cluster"), col("codes"))
      .join(probes, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adcDist(pq).as("adc_dist"))
    rankAndRerank(candidates, indexed, queries, k)
  }

  /** IVF-PQ (the faiss composite index): candidates come from the
    * query's nprobe nearest IVF cells ONLY (a keyed equi-join on the
    * cell id — per query, nprobe/k of the corpus is read), and within
    * the probed cells the scan reads the 8-byte PQ codes, not the raw
    * vectors. Pruning × compression in one plan: at 100 TB the ANN
    * query touches (nprobe/k) of the rows × 1/32 of the bytes, then
    * re-ranks k winners exactly. `indexed` must carry both `cluster`
    * (from [[IvfIndex.assign]]) and `codes` (from [[encode]]).
    */
  def adcTopKIvf(indexed: DataFrame, queries: DataFrame,
      ivf: IvfIndex.Model, pq: Model, k: Int, nprobe: Int): DataFrame = {
    val cellScores: Seq[Column] = ivf.centroids.toSeq.zipWithIndex.map { case (ctr, j) =>
      val cLit = array(ctr.map(x => lit(x.toFloat)): _*)
      struct((lit(ctr.map(x => x * x).sum) -
        lit(2.0) * VectorExpressions.dotF32(col("query_vec"), cLit)).as("s"),
        lit(j).as("c"))
    }
    val probes = queries
      .withColumn("__probe", explode(slice(array_sort(array(cellScores: _*)), 1, nprobe)))
      .select(col("query_id"), col("query_vec"), col("__probe.c").as("cluster"))
    // No broadcast hint: AQE sizes the probe side at runtime (the
    // IvfIndex.annTopK convention — a huge query batch shuffles on
    // `cluster` instead of OOMing the driver).
    val candidates = indexed
      .select(col("vec_id"), col("cluster"), col("codes"))
      .join(probes, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adcDist(pq).as("adc_dist"))
    rankAndRerank(candidates, indexed, queries, k)
  }
}
