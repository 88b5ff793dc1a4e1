package graft

import org.apache.spark.sql.functions._

import graft.sim.{IvfIndex, PqIndex, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables(spark, sf("sf0.001"), "embeddings")
  private lazy val model = PqIndex.train(emb, numSub = 8, ksub = 16, iters = 0)

  test("every vector encodes to M in-range codes") {
    val enc = PqIndex.encode(emb, model)
    assert(enc.count() == emb.count())
    val bad = enc.filter(
      size(col("codes")) =!= model.numSub ||
        exists(col("codes"), c => c < 0 || c >= model.ksub))
    assert(bad.count() == 0)
  }

  test("init-codebook vectors are their own nearest code (ADC self-distance 0)") {
    // vec_id < ksub ARE the codebook entries (iters=0): each subspace's
    // argmin must land on the vector's own entry, so its ADC distance
    // to itself is exactly zero.
    val enc = PqIndex.encode(emb, model)
    val queries = emb.filter(col("vec_id") < model.ksub)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    // adcTopK excludes self-pairs, so recompute the self ADC directly
    // from the codes: code for vec j in every subspace must be j.
    val self = enc.filter(col("vec_id") < model.ksub)
      .filter(!forall(col("codes"), c => c === col("vec_id").cast("int")))
    assert(self.count() == 0)
    assert(queries.count() == model.ksub.toLong)
  }

  test("saved PQ index searches bit-identically to the fresh one") {
    val path = java.nio.file.Files.createTempDirectory("pq_save").toString
    val enc = PqIndex.encode(emb, model)
    PqIndex.save(enc, model, path)
    val (loaded, codes) = PqIndex.load(spark, path)
    assert(loaded.numSub == model.numSub && loaded.ksub == model.ksub)
    model.codebooks.zip(loaded.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(java.util.Arrays.equals(x, y)) }
    }
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def res(r: org.apache.spark.sql.DataFrame) =
      r.select("query_id", "vec_id", "rnk").as[(Long, Long, Long)].collect().toSet
    assert(res(PqIndex.adcTopKSplit(codes, emb, q, loaded, 10)) ==
      res(PqIndex.adcTopK(enc, q, model, 10)))
  }

  test("lookup-table ADC is bit-equal to the expression formulation, distances included") {
    // The LUT path (the round-11 DEFAULT serving kernel) must be a pure
    // physical rewrite: same candidates, same ROUNDED DISTANCES to the
    // last bit, same ranks — on both the init codebook and a
    // Lloyd-trained one (non-trivial cell values).
    val trained = PqIndex.train(emb, numSub = 8, ksub = 16, iters = 3)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "adc_dist", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    Seq(model, trained).foreach { m =>
      val enc = PqIndex.encode(emb, m)
      val expr = rows(PqIndex.adcTopKSplitExpr(enc, emb, q, m, 10))
      val lut = rows(PqIndex.adcTopKSplit(enc, emb, q, m, 10))
      assert(expr == lut, s"LUT ADC diverged from expression ADC for ksub=${m.ksub}")
    }
  }

  test("LUT default is bit-equal on the IVF-PQ and residual-IVF-PQ serving paths too") {
    // The q122/q128 kernels: probe selection and residuals stay
    // in-plan, only the per-candidate distance moves to the lookup
    // table — full-result equality against the expression paths.
    val ivf = IvfIndex.train(emb, k = 16, iters = 0)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "adc_dist", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    val pqRaw = PqIndex.train(emb, numSub = 8, ksub = 16, iters = 0)
    val idxRaw = PqIndex.encode(IvfIndex.assign(emb, ivf), pqRaw)
    assert(rows(PqIndex.adcTopKIvf(idxRaw, q, ivf, pqRaw, 10, nprobe = 4)) ==
      rows(PqIndex.adcTopKIvfExpr(idxRaw, q, ivf, pqRaw, 10, nprobe = 4)),
      "IVF-PQ LUT diverged from the expression path")
    val pqRes = PqIndex.trainResiduals(emb, ivf, numSub = 8, ksub = 16, iters = 0)
    val idxRes = IvfIndex.assign(emb, ivf)
      .withColumn("codes", PqIndex.codesCol(
        PqIndex.residualCol(col("embedding"), col("cluster"), ivf), pqRes))
    assert(rows(PqIndex.adcTopKIvfResidual(idxRes, q, ivf, pqRes, 10, nprobe = 4)) ==
      rows(PqIndex.adcTopKIvfResidualExpr(idxRes, q, ivf, pqRes, 10, nprobe = 4)),
      "residual IVF-PQ LUT diverged from the expression path")
  }

  test("ADC top-k recall vs brute force is reasonable") {
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.knnJoin(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = PqIndex.adcTopK(PqIndex.encode(emb, model), q, model, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, want) =>
      (pq.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean ADC recall $mean too low (recalls=$recalls)")
  }

  test("Lloyd-trained codebooks reduce mean quantization error vs init") {
    def meanQuantErr(m: PqIndex.Model): Double = {
      val vecs = emb.orderBy("vec_id").select("embedding")
        .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
      val sd = m.subDim
      vecs.map { v =>
        (0 until m.numSub).map { mm =>
          val sub = v.slice(mm * sd, (mm + 1) * sd)
          m.codebooks(mm).map { c =>
            sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          }.min
        }.sum
      }.sum / vecs.length
    }
    val trained = PqIndex.train(emb, numSub = 8, ksub = 16, iters = 5)
    val e0 = meanQuantErr(model)
    val e5 = meanQuantErr(trained)
    assert(e5 < e0, s"Lloyd training did not reduce quantization error: $e0 -> $e5")
  }

  test("ADC search is deterministic across runs and trained codebooks run the same plan") {
    val trained = PqIndex.train(emb, numSub = 8, ksub = 16, iters = 3)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def run(m: PqIndex.Model) =
      PqIndex.adcTopK(PqIndex.encode(emb, m), q, m, k = 10)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Long)]
        .collect().toSeq.sorted
    assert(run(model) == run(model))
    assert(run(trained) == run(trained))
    assert(run(trained).size == 30)
  }

  test("IVF-PQ with exhaustive probing equals flat ADC (incl. distances)") {
    import graft.sim.IvfIndex
    val ivf = IvfIndex.train(emb, k = 8, iters = 2)
    val indexed = PqIndex.encode(IvfIndex.assign(emb, ivf), model)
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "adc_dist", "rnk")
        .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    // nprobe = k probes every cell: the candidate set is the full corpus,
    // so IVF-PQ must reproduce the flat ADC result exactly
    val flat = rows(PqIndex.adcTopK(indexed, q, model, k = 10))
    val ivfpq = rows(PqIndex.adcTopKIvf(indexed, q, ivf, model, k = 10, nprobe = 8))
    assert(flat == ivfpq)
  }

  test("residual IVF-PQ beats raw IVF-PQ in the trained-tight-cells regime (the q126 inversion)") {
    import graft.sim.{IvfIndex, Similarity}
    // Clustered corpus + Lloyd-trained cells: residual magnitudes are a
    // fraction of vector magnitudes, the regime residual PQ is built
    // for. q126 measures the OPPOSITE ordering on the isotropic catalog
    // fixture (residuals there are LARGER than the vectors); this
    // benchmark pins the regime where the faiss-default composition
    // earns its place. noise is set high enough that raw-vector PQ
    // (codebooks quantizing whole cluster centers) visibly lags.
    val df = SparkSpec.plantedClusters(spark, n = 1200, c = 24, dim = 16, noise = 0.25)
    val ivf = IvfIndex.train(df, k = 24, iters = 5, sampleN = 1200)
    val pqRaw = PqIndex.train(df, numSub = 4, ksub = 8, iters = 3, sampleN = 1200)
    val pqRes = PqIndex.trainResiduals(df, ivf, numSub = 4, ksub = 8, iters = 3, sampleN = 1200)
    val assigned = IvfIndex.assign(df, ivf)
    val rawIndexed = PqIndex.encode(assigned, pqRaw)
    val resIndexed = assigned.withColumn("codes",
      PqIndex.codesCol(PqIndex.residualCol(col("embedding"), col("cluster"), ivf), pqRes))
    val q = df.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.knnJoin(df, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, want) =>
        (got.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
      }.sum / exact.size
    }
    val rawR = recall(PqIndex.adcTopKIvf(rawIndexed, q, ivf, pqRaw, k = 10, nprobe = 4))
    val resR = recall(PqIndex.adcTopKIvfResidual(resIndexed, q, ivf, pqRes, k = 10, nprobe = 4))
    // deterministic fixture: residual measured at ~0.59; part of its
    // remaining loss is shared nprobe misses, not quantization —
    // assert the inversion with a real margin rather than pinning
    // both absolute values
    assert(resR > rawR + 0.05, s"residual recall $resR should beat raw recall $rawR with tight cells")
    assert(resR >= 0.5, s"residual recall $resR unexpectedly low in its home regime")
  }

  /** The q154/q157 energy-concentrated fixture: dims 1–8 keep their
    * variance, 9–64 shrink 128× (float-lossless power of two).
    */
  private def energyFix = emb.select(col("vec_id"),
    transform(sequence(lit(1), lit(64)), i =>
      when(i <= 8, element_at(col("embedding"), i))
        .otherwise((element_at(col("embedding"), i) / lit(128.0)).cast("float")))
      .as("embedding")).persist()

  test("learned OPQ: orthogonal, bit-deterministic, and beats raw PQ + the q157 bar on the energy fixture") {
    val fix = energyFix
    val (r, opqModel) = PqIndex.trainOpq(fix, numSub = 8, ksub = 16,
      opqIters = 8, pqIters = 4, sampleN = 500)
    // R is orthogonal: RᵀR = I within numerical tolerance
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(k)(i) * r(k)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"RᵀR[$i][$j] = $dot")
    }
    // deterministic to the last bit (fixed-sweep Jacobi, ordered sample)
    val (r2, _) = PqIndex.trainOpq(fix, numSub = 8, ksub = 16,
      opqIters = 8, pqIters = 4, sampleN = 500)
    r.zip(r2).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }

    // recall panel: rotate corpus AND queries with R, ADC-search the
    // rotated space, judge against exact kNN on the unrotated fixture
    // (R orthogonal ⇒ neighbor sets are preserved)
    def queriesOf(df: org.apache.spark.sql.DataFrame) = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.knnJoinAgg(fix, queriesOf(fix), k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(corpus: org.apache.spark.sql.DataFrame, m: PqIndex.Model): Double = {
      val got = PqIndex.adcTopK(PqIndex.encode(corpus, m), queriesOf(corpus), m, k = 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, want) =>
        (got.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
      }.sum / exact.size
    }
    val rotated = fix.select(col("vec_id"),
      PqIndex.rotateCol(col("embedding"), r).as("embedding"))
    val opqRecall = meanRecall(rotated, opqModel)
    val rawRecall = meanRecall(fix, PqIndex.train(fix, 8, 16, iters = 4, sampleN = 500))
    assert(opqRecall > rawRecall,
      s"learned OPQ recall $opqRecall must beat same-budget raw PQ $rawRecall")
    assert(opqRecall >= 0.62,
      s"learned OPQ recall $opqRecall below the q157 variance-balanced bar (0.62)")
  }

  test("distributed OPQ: bit-deterministic under repartitioning, orthogonal, beats raw PQ + the q157 bar") {
    val fix = energyFix
    val (r, model) = PqIndex.trainOpqDistributed(fix, numSub = 8, ksub = 16,
      opqIters = 4, pqIters = 2)
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(k)(i) * r(k)(j)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"RᵀR[$i][$j] = $dot")
    }
    // the scale property the trainer exists for: the same corpus under a
    // DIFFERENT partitioning must reproduce R and the codebooks to the
    // last bit (two-phase ordered folds everywhere)
    val (r2, model2) = PqIndex.trainOpqDistributed(fix.repartition(7), numSub = 8,
      ksub = 16, opqIters = 4, pqIters = 2)
    r.zip(r2).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    model.codebooks.zip(model2.codebooks).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(java.util.Arrays.equals(x, y)) }
    }
    // recall panel (the trainOpq judging convention): rotated-space ADC
    // vs exact kNN on the unrotated fixture
    def queriesOf(df: org.apache.spark.sql.DataFrame) = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.knnJoinAgg(fix, queriesOf(fix), k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(corpus: org.apache.spark.sql.DataFrame, m: PqIndex.Model): Double = {
      val got = PqIndex.adcTopK(PqIndex.encode(corpus, m), queriesOf(corpus), m, k = 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (qid, want) =>
        (got.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
      }.sum / exact.size
    }
    val rotated = fix.select(col("vec_id"),
      PqIndex.rotateCol(col("embedding"), r).as("embedding"))
    val opqRecall = meanRecall(rotated, model)
    val rawRecall = meanRecall(fix, PqIndex.train(fix, 8, 16, iters = 2, sampleN = 500))
    assert(opqRecall > rawRecall,
      s"distributed OPQ recall $opqRecall must beat same-budget raw PQ $rawRecall")
    assert(opqRecall >= 0.62,
      s"distributed OPQ recall $opqRecall below the q157 variance-balanced bar (0.62)")
  }

  test("ADC candidate scan reads codes, not embeddings (and no cartesian on the corpus side)") {
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val df = PqIndex.adcTopK(PqIndex.encode(emb, model), q, model, k = 10)
    val plan = df.queryExecution.executedPlan.toString
    // the only joins are the broadcast of the bounded query batch and
    // the k-winner re-rank joins; the corpus never self-joins
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
