package graft

import org.apache.spark.sql.functions._

import graft.sim.{IvfIndex, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.core.Tables(spark, sf("sf0.001"), "embeddings")
  private lazy val model = IvfIndex.train(emb, k = 16, iters = 5)

  test("assignment covers every vector with a valid cell id") {
    val assigned = IvfIndex.assign(emb, model)
    assert(assigned.count() == emb.count())
    val range = assigned.agg(min("cluster"), max("cluster")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < model.k)
    // cells are reasonably balanced: no cell owns more than half the data
    val biggest = assigned.groupBy("cluster").count().agg(max("count")).head().getLong(0)
    assert(biggest < emb.count() / 2)
  }

  test("IVF ANN recall vs brute force is reasonable at nprobe=4/16") {
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = Similarity.knnJoin(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = IvfIndex.annTopK(IvfIndex.assign(emb, model), q, model, k = 10, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, want) => (ivf.getOrElse(qid, Set.empty) & want).size.toDouble / want.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall $mean too low (recalls=$recalls)")
  }

  test("IVF search is deterministic across runs") {
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val assigned = IvfIndex.assign(emb, model)
    def run() = IvfIndex.annTopK(assigned, q, model, 10, 4)
      .select("vec_id", "rnk").as[(Long, Long)].collect().toSeq.sorted
    assert(run() == run())
  }

  test("trainDistributed == driver train, bit-equal, on a single-bucket corpus") {
    // 500 vectors < one 512-id bucket: the distributed two-phase fold
    // degenerates to one vec_id-ordered fold per cell — the exact
    // association of train's sequential sums — so centroids must match
    // to the last bit (assignment float-cast vs full-double argmins
    // agree on this data; a mismatch here means the trainers diverged).
    val driver = IvfIndex.train(emb, k = 8, iters = 3, sampleN = 500)
    val dist = IvfIndex.trainDistributed(emb, IvfIndex.initFirst(emb, 8), iters = 3)
    assert(driver.centroids.length == dist.centroids.length)
    driver.centroids.zip(dist.centroids).zipWithIndex.foreach { case ((a, b), c) =>
      assert(java.util.Arrays.equals(a, b), s"centroid $c differs")
    }
  }

  test("trainDistributed is bit-deterministic under repartitioning (multi-bucket)") {
    // bucketSize=64 forces 8 buckets over the 500 ids, exercising the
    // phase-2 bucket-ordered fold; results must not depend on physical
    // partitioning (the whole point of the ordered two-phase sum).
    val init = IvfIndex.initFirst(emb, 8)
    val a = IvfIndex.trainDistributed(emb.repartition(7), init, iters = 2, bucketSize = 64)
    val b = IvfIndex.trainDistributed(emb.repartition(13), init, iters = 2, bucketSize = 64)
    a.centroids.zip(b.centroids).zipWithIndex.foreach { case ((x, y), c) =>
      assert(java.util.Arrays.equals(x, y), s"centroid $c differs across partitionings")
    }
    // and multi-bucket training still converges sanely: assignment is
    // total and cells stay populated enough to beat the degenerate case
    val assigned = IvfIndex.assign(emb, a)
    assert(assigned.count() == emb.count())
    assert(assigned.select("cluster").distinct().count() >= 4)
  }

  test("trainDistributed with exhaustive hierarchical assignment == flat trainer, bit-equal, at k=64") {
    // The occupancy-scaled-k config: 64 cells, routed per round through
    // 8 coarse cells with nProbe = coarseK (exhaustive). The dyn argmin
    // is fed double norms, so scores — hence assignments, hence the
    // ordered two-phase sums, hence the trained centroids — must equal
    // the flat trainer to the last bit. bucketSize=64 exercises the
    // multi-bucket fold under both assigners.
    val init = IvfIndex.initFirst(emb, 64)
    val flat = IvfIndex.trainDistributed(emb, init, iters = 2, bucketSize = 64)
    val hier = IvfIndex.trainDistributed(emb, init, iters = 2, bucketSize = 64,
      assigner = IvfIndex.assignHierarchicalExact)
    flat.centroids.zip(hier.centroids).zipWithIndex.foreach { case ((a, b), c) =>
      assert(java.util.Arrays.equals(a, b), s"centroid $c differs between assigners")
    }
    // production (approximate) routing still trains a usable model:
    // deterministic, and assignment stays total over valid cells
    def approx() = IvfIndex.trainDistributed(emb, init, iters = 2, bucketSize = 64,
      assigner = (df, m) => IvfIndex.assignHierarchical(df, m, nProbe = 2))
    val p1 = approx(); val p2 = approx()
    p1.centroids.zip(p2.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "approximate-routed training must be deterministic")
    }
    val assigned = IvfIndex.assign(emb, p1)
    assert(assigned.count() == emb.count())
    assert(assigned.select("cluster").distinct().count() >= 16)
  }

  test("saved index searches bit-identically to the fresh one") {
    val path = java.nio.file.Files.createTempDirectory("ivf_save").toString
    val assigned = IvfIndex.assign(emb, model)
    IvfIndex.save(assigned, model, path)
    val (loaded, codes) = IvfIndex.load(spark, path)
    model.centroids.zip(loaded.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "centroids did not round-trip bit-exactly")
    }
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def res(df: org.apache.spark.sql.DataFrame, m: IvfIndex.Model) =
      IvfIndex.annTopK(df, q, m, 10, 4)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Long)].collect().toSet
    assert(res(codes, loaded) == res(assigned, model))
    // and the codes table is physically laid out one directory per cell —
    // the layout dynamic partition pruning needs to skip unprobed cells
    val parts = new java.io.File(s"$path/codes").listFiles.filter(_.isDirectory).map(_.getName)
    assert(parts.count(_.startsWith("cluster=")) == model.k)
  }

  test("appendToArtifact: appended index == fresh union index under the frozen model, bit-equal") {
    val path = java.nio.file.Files.createTempDirectory("ivf_append").toString
    val base = emb.filter(pmod(col("vec_id"), lit(4)) =!= 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(4)) === 0)
    IvfIndex.save(IvfIndex.assign(base, model), model, path)
    val frozen = IvfIndex.appendToArtifact(spark, path, delta)
    model.centroids.zip(frozen.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "append must not touch the centroids")
    }
    val (loaded, codes) = IvfIndex.load(spark, path)
    // 1. the reloaded codes ARE the union assignment: same (vec_id, cluster) rows
    val want = IvfIndex.assign(emb, model)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toSet
    val got = codes.select("vec_id", "cluster").as[(Long, Int)].collect().toSet
    assert(got == want, "appended codes differ from the fresh union assignment")
    // 2. search over the appended artifacts == search over the fresh union index
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def res(df: org.apache.spark.sql.DataFrame, m: IvfIndex.Model) =
      IvfIndex.annTopK(df, q, m, 10, 4)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Long)].collect().toSet
    assert(res(codes, loaded) == res(IvfIndex.assign(emb, model), model))
    // 3. the append wrote only into cluster=<cell> partition dirs (no stray
    //    top-level files beyond parquet bookkeeping) — the layout partition
    //    pruning depends on survives the append
    val stray = new java.io.File(s"$path/codes").listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(stray.isEmpty, s"append left unpartitioned files: ${stray.map(_.getName).mkString(",")}")
  }

  test("daily append composes with weekly refresh: appends serve from CURRENT until the retrain supersedes them") {
    val base = java.nio.file.Files.createTempDirectory("ivf_append_refresh").toString
    val old = emb.filter(pmod(col("vec_id"), lit(4)) =!= 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(4)) === 0)
    // week 1: full build on the old corpus
    IvfIndex.refreshArtifact(base, old, k = 16, iters = 1)
    val cur = graft.core.ArtifactIO.readString(spark, s"$base/CURRENT").trim
    // daily ingest: append the delta into the CURRENT version in place
    IvfIndex.appendToArtifact(spark, s"$base/$cur", delta)
    val (m1, codes1) = IvfIndex.loadCurrent(spark, base)
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cluster").as[(Long, Int)].collect().toSet
    assert(codeSet(codes1) == codeSet(IvfIndex.assign(emb, m1)),
      "appended rows must serve from CURRENT, assigned under the frozen week-1 model")
    // week 2: the scheduled refresh retrains on the full union and re-points
    val m2 = IvfIndex.refreshArtifact(base, emb, k = 16, iters = 1)
    val (mLoaded, codes2) = IvfIndex.loadCurrent(spark, base)
    m2.centroids.zip(mLoaded.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "CURRENT must point at the retrained model")
    }
    assert(codeSet(codes2) == codeSet(IvfIndex.assign(emb, m2)),
      "refreshed codes must be the union assigned under the retrained model")
    // the retrain actually saw the appended mass (models differ)
    assert(!m1.centroids.zip(m2.centroids).forall { case (a, b) => java.util.Arrays.equals(a, b) },
      "week-2 training on the union should move the centroids")
    // and the superseded week-1 version (with its append) stays readable
    assert(codeSet(IvfIndex.load(spark, s"$base/$cur")._2) == codeSet(IvfIndex.assign(emb, m1)),
      "the superseded version must stay readable for draining readers")
  }

  test("versioned refresh: CURRENT re-points atomically, old versions stay readable") {
    val base = java.nio.file.Files.createTempDirectory("ivf_versions").toString
    val half = emb.filter(col("vec_id") < 250)
    val m1 = IvfIndex.refreshArtifact(base, half, k = 8, iters = 1)
    val (c1, codes1) = IvfIndex.loadCurrent(spark, base)
    assert(codes1.count() == 250)
    m1.centroids.zip(c1.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    // corpus grows; refresh retrains and re-points
    val m2 = IvfIndex.refreshArtifact(base, emb, k = 8, iters = 1)
    val (c2, codes2) = IvfIndex.loadCurrent(spark, base)
    assert(codes2.count() == emb.count())
    m2.centroids.zip(c2.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(!m1.centroids.zip(m2.centroids).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) }, "retraining on more data must move centroids")
    // the superseded version is untouched — mid-refresh readers stay correct
    val (old, oldCodes) = IvfIndex.load(spark, s"$base/v1")
    assert(oldCodes.count() == 250)
    m1.centroids.zip(old.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("refreshArtifact with the hierarchical assigner produces a bit-equal artifact to flat") {
    // the occupancy-scaled-k refresh path: training AND the saved codes
    // go through exhaustive hierarchical routing — artifact must be
    // indistinguishable from the flat refresh
    val baseA = java.nio.file.Files.createTempDirectory("ivf_rfA").toString
    val baseB = java.nio.file.Files.createTempDirectory("ivf_rfB").toString
    val mA = IvfIndex.refreshArtifact(baseA, emb, k = 16, iters = 1)
    val mB = IvfIndex.refreshArtifact(baseB, emb, k = 16, iters = 1,
      assigner = IvfIndex.assignHierarchicalExact)
    mA.centroids.zip(mB.centroids).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "refresh-trained centroids differ between assigners")
    }
    def codesOf(base: String) = IvfIndex.loadCurrent(spark, base)._2
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(codesOf(baseA) == codesOf(baseB), "saved codes differ between assigners")
  }

  test("initHash is partitioning-invariant and selects actual corpus vectors") {
    val a = IvfIndex.initHash(emb, 16)
    val b = IvfIndex.initHash(emb.repartition(5), 16)
    a.centroids.zip(b.centroids).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x, y))
    }
    // every seed is a real embedding row (hash init selects, never averages)
    val all = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSet
    a.centroids.foreach(c => assert(all.contains(c.toSeq)))
    // and it differs from first-k init on this corpus (the bias it removes)
    val first = IvfIndex.initFirst(emb, 16)
    assert(a.centroids.map(_.toSeq).toSet != first.centroids.map(_.toSeq).toSet)
  }

  test("native NearestCentroid == the column-arithmetic twin, incl. degenerate inputs") {
    import org.apache.spark.sql.functions._
    val model = IvfIndex.train(emb, k = 16, iters = 2)
    val clean = emb.select(col("vec_id"), col("embedding"))
    val degenerate = Seq(
      (900L, null.asInstanceOf[Seq[Option[Float]]]),       // NULL array
      (901L, Seq.fill(64)(Option(0.5f)).updated(3, None)), // NULL element
      (902L, Seq.fill(10)(Option(1.0f))))                  // ragged
      .toDF("vec_id", "embedding")
    val rows = clean.unionByName(degenerate)
      .select(col("vec_id"),
        IvfIndex.clusterCol(col("embedding"), model).as("fast"),
        IvfIndex.clusterColTwin(col("embedding"), model).as("slow"))
      .as[(Long, Option[Int], Option[Int])].collect()
    rows.foreach { case (id, fast, slow) =>
      assert(fast == slow, s"vec $id: native $fast != column twin $slow")
    }
    assert(rows.count(_._2.isEmpty) == 3, "exactly the degenerate rows must be NULL")
  }

  test("hierarchical assignment: exact at coarseK=1, near-flat agreement at sqrt-k") {
    import org.apache.spark.sql.functions._
    val model = IvfIndex.train(emb, k = 64, iters = 0, sampleN = 512)
    val flat = IvfIndex.assign(emb, model)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    // coarseK = 1: one group holding every fine centroid — routing is
    // trivial, so the dyn argmin must reproduce the flat assignment.
    val exact = IvfIndex.assignHierarchical(emb, model, coarseK0 = 1)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(exact == flat, "coarseK=1 hierarchical must equal flat assignment")
    // default coarseK = sqrt(k): approximate only near coarse borders
    val hier = IvfIndex.assignHierarchical(emb, model)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(hier.keySet == flat.keySet, "every vector must be assigned")
    assert(hier.values.forall(c => c >= 0 && c < 64), "cell ids must be valid")
    val agree = flat.count { case (id, c) => hier(id) == c }
    assert(agree.toDouble / flat.size >= 0.8,
      s"routed assignment should mostly agree with flat ($agree/${flat.size})")
  }

  private def plantedClusters(n: Int, c: Int, dim: Int) =
    SparkSpec.plantedClusters(spark, n, c, dim)

  test("planted clusters: hierarchical routing agrees with flat assignment in the clustered regime") {
    // The regime SemDeDup actually runs in: organically clustered
    // embeddings, k sized to the cluster count. Boundary vectors are
    // rare because clusters are separated, so multi-probe routing
    // should agree with the flat argmin almost everywhere.
    val df = plantedClusters(n = 2000, c = 40, dim = 16)
    val model = IvfIndex.train(df, k = 40, iters = 3, sampleN = 2000)
    val flat = IvfIndex.assign(df, model)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val hier = IvfIndex.assignHierarchical(df, model, nProbe = 4)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val agree = flat.count { case (id, cl) => hier(id) == cl }
    assert(agree.toDouble / flat.size >= 0.99,
      s"clustered-regime agreement too low: $agree/${flat.size}")
    // and every planted cluster is internally pure under flat assignment
    val purity = flat.groupBy(_._1 % 40).values
      .map(g => g.groupBy(_._2).values.map(_.size).max.toDouble / g.size)
    assert(purity.forall(_ >= 0.95), s"planted clusters not recovered: $purity")
  }

  test("tuneNprobe finds the smallest probe count meeting a recall target") {
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    // target 1.0 must terminate (nprobe = k probes everything)
    val (npFull, rFull) = IvfIndex.tuneNprobe(emb, model, q, k = 10, targetRecall = 1.0)
    assert(rFull == 1.0 && npFull <= model.k)
    // a lax target needs no more probes than a strict one
    val (npLax, rLax) = IvfIndex.tuneNprobe(emb, model, q, k = 10, targetRecall = 0.3)
    assert(npLax <= npFull, s"lax target tuned $npLax > strict target's $npFull")
    assert(rLax >= 0.3)
    // the tuned setting reproduces its measured recall when re-run
    val (np2, r2) = IvfIndex.tuneNprobe(emb, model, q, k = 10, targetRecall = 0.3)
    assert((np2, r2) == ((npLax, rLax)), "tuning must be deterministic")
  }

  test("tuneNprobe needs few probes on clustered data (neighbors share the query's cell)") {
    val df = plantedClusters(n = 1000, c = 20, dim = 16)
    val m = IvfIndex.train(df, k = 20, iters = 5, sampleN = 1000)
    val q = df.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val (np, r) = IvfIndex.tuneNprobe(df, m, q, k = 10, targetRecall = 0.95)
    assert(np <= 2, s"clustered regime should need <= 2 probes, tuned $np (recall $r)")
    assert(r >= 0.95)
  }

  test("semanticDedupK auto-switches to hierarchical routing past the k threshold") {
    import graft.sim.Similarity
    val df = plantedClusters(n = 1000, c = 20, dim = 16)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("vec_id", "kept_by", "cosine_sim")
        .as[(Long, Long, Double)].collect().toSeq.sorted
    // hierSwitchK below k forces the routed path; the planted clusters
    // are separated, so the dedup result must match the flat path
    // exactly (every near-dup pair lives deep inside one cluster).
    val flat = rows(Similarity.semanticDedupK(df, tau = 0.99, k = 20, sampleN = 1000))
    val routed = rows(Similarity.semanticDedupK(df, tau = 0.99, k = 20, sampleN = 1000,
      hierSwitchK = 8))
    assert(flat == routed, "routed semanticDedup must match flat on separated clusters")
    assert(flat.nonEmpty, "planted near-dups must be found (offsets are tiny => cosine ~1)")
  }
}
