package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Binary-column plumbing (SURVEY.md §2.C multimodal): payloads are
  * opaque `binary` columns with typed metadata alongside. The full
  * decode/feature pipeline (with the stubbed decoder) lives in
  * graft.multimodal; this query exercises the cross-engine-checkable
  * part — byte length and prefix of the binary payload.
  */
object QueriesBinary {
  def q28_binary_meta(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        // Truncate the BINARY to 8 bytes first, THEN hex — hexing the whole
        // payload would materialize a 2x-payload string per row just to keep
        // 16 chars. Spark's hex() is already uppercase; avoid upper() here —
        // Spark 4's collation-aware ICU upper-case path has a pathologically
        // slow static init (minutes of CPU on first use).
        hex(substring(col("text").cast("binary"), 1, 8)).as("head_hex"))
      .orderBy("doc_id")

  val q28Sql: String =
    """SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       upper(left(hex(encode(text)), 16)) AS head_hex
FROM documents ORDER BY doc_id"""

  /** The multimodal feature pipeline end-to-end, oracle-checkable:
    * payload → deterministic feature vector → cosine kNN. The "decoder"
    * here is a portable-hash feature extractor (8 dims, each the
    * polynomial hash of the payload salted by the dim index, mapped to
    * [-0.5, 0.5]) — standing in for the real media decoder the sandbox
    * can't host (Multimodal.FakeDecoder), but unlike it, replayable in
    * SQL so the WHOLE binary→feature→search pipeline hash-matches
    * DuckDB. Feature extraction is a narrow per-row projection;
    * similarity is the q17 brute shape (one query row broadcast against
    * the corpus; rounded before ordering).
    */
  def q93_payload_knn(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val dims = 8
    val vec = array((0 until dims).map { j =>
      (pmod(PortableHash.asciiPolyHash(concat(lit(j.toString), col("text"))), lit(997L))
        .cast("double") / lit(997.0) - lit(0.5))
    }: _*)
    val e = Tables(s, dir, "documents").select(col("doc_id"), vec.as("v"))
    val q = e.filter(col("doc_id") === 0)
      .select(col("v").as("qv"))
    val dot = aggregate(zip_with(col("v"), col("qv"), (a, b) => a * b), lit(0.0), (s0, x) => s0 + x)
    def norm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x * x), lit(0.0), (s0, x) => s0 + x))
    e.filter(col("doc_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("doc_id"), round(dot / (norm(col("v")) * norm(col("qv"))), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col("doc_id"))
      .limit(10)
  }

  val q93Sql: String = {
    val polyHash = graft.queries.QueriesDedup.polyHashSql("CAST(j AS VARCHAR) || text")
    raw"""WITH e AS (
  SELECT doc_id,
         list_transform(range(0, 8), j -> CAST($polyHash % 997 AS DOUBLE) / 997.0 - 0.5) AS v
  FROM documents),
q AS (SELECT v AS qv FROM e WHERE doc_id = 0),
s AS (SELECT e.doc_id,
             round(list_sum(list_transform(range(1, 9), i -> e.v[i] * qv[i]))
                   / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(qv, x -> x * x)))), 6) AS cosine_sim
      FROM e, q WHERE e.doc_id <> 0)
SELECT doc_id, cosine_sim FROM s ORDER BY cosine_sim DESC, doc_id LIMIT 10"""
  }

  /** The multimodal→embedding→ANN composition END-TO-END: binary payload
    * → deterministic feature vector (the q93 extractor, cast to the
    * float embedding type) → sign-random-projection bucket ANN
    * (Similarity.annLshTopK, the q27 operator) instead of q93's brute
    * scan. The plan's candidate generation is an EQUI-JOIN on the small
    * bucket id — at 100 TB the feature scan is embarrassingly parallel
    * and the probe join hash-co-locates by bucket; no per-pair predicate
    * exists anywhere. The oracle replays every stage in SQL: the same
    * polynomial-hash features (float-cast like the Spark side), the same
    * fixed-seed hyperplane sign buckets, the same Hamming-≤2 multi-probe,
    * the same exact-cosine re-rank.
    */
  def q97_payload_ann(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val dims = 8
    val vec = array((0 until dims).map { j =>
      (pmod(PortableHash.asciiPolyHash(concat(lit(j.toString), col("text"))), lit(997L))
        .cast("double") / lit(997.0) - lit(0.5))
    }: _*)
    // Persist the feature projection: it feeds the corpus side, the
    // query side and the exact re-rank — one scan instead of three.
    val e = Tables(s, dir, "documents")
      .select(col("doc_id").as("vec_id"), vec.cast("array<float>").as("embedding"))
      .persist()
    val queries = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    graft.sim.Similarity.annLshTopK(e, queries, k = 10,
        numPlanes = 6, probeHamming = 2, dim = dims)
      .select(col("query_id"), col("vec_id"), col("cosine_sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Mirrors q97 stage by stage: feature doubles are squeezed through
    * REAL (the Spark side stores array<float>), buckets recompute the
    * sign bits against the same float-cast plane literals, candidates
    * are the Hamming-≤2 buckets, cosine re-ranks exactly.
    */
  val q97Sql: String = {
    val polyHash = graft.queries.QueriesDedup.polyHashSql("CAST(j AS VARCHAR) || text")
    val planes = QueriesSim.planesSqlLiteral(graft.sim.Similarity.hyperplanes(numPlanes = 6, dim = 8))
    raw"""WITH e AS (
  SELECT doc_id AS vec_id,
         list_transform(range(0, 8),
           j -> CAST(CAST(CAST($polyHash % 997 AS DOUBLE) / 997.0 - 0.5 AS REAL) AS DOUBLE)) AS v
  FROM documents),
pl AS (SELECT unnest(range(0, 6)) AS j, unnest($planes) AS p),
eb AS (SELECT e.vec_id,
              CAST(sum(CASE WHEN list_sum(list_transform(range(1, 9), i -> e.v[i] * pl.p[i])) >= 0
                            THEN CAST(1 AS BIGINT) << CAST(pl.j AS INTEGER) ELSE 0 END) AS BIGINT) AS bucket
       FROM e, pl GROUP BY e.vec_id),
q AS (SELECT eb.bucket AS qbucket, e.v AS qv, e.vec_id AS qid
      FROM eb JOIN e ON e.vec_id = eb.vec_id WHERE e.vec_id = 0),
s AS (SELECT q.qid AS query_id, e.vec_id,
             round(list_sum(list_transform(range(1, 9), i -> e.v[i] * qv[i]))
                   / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                      * sqrt(list_sum(list_transform(qv, x -> x * x)))), 6) AS cosine_sim
      FROM e JOIN eb ON e.vec_id = eb.vec_id, q
      WHERE bit_count(xor(eb.bucket, q.qbucket)) <= 2 AND e.vec_id <> q.qid),
r AS (SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM s)
SELECT query_id, vec_id, cosine_sim, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk"""
  }

  /** The payload composition through the OTHER ANN family: binary payload
    * → deterministic features → IVF (inverted-file cells, nprobe probing)
    * — q34's operator fed from q97's feature extractor, so both classic
    * ANN scale paths are exercised end-to-end from raw payload. Init
    * centroids (iters = 0) keep every step SQL-replayable: cells are the
    * first 16 docs' feature vectors, assignment/probing use the
    * |c|² − 2·e·c argmin with first-index tie-break, exact cosine
    * re-ranks within the probed cells. At scale the cell equi-join reads
    * only nprobe cells per query — the candidate key is a cell id, never
    * a vector.
    */
  def q99_payload_ivf(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.PortableHash
    val dims = 8
    val vec = array((0 until dims).map { j =>
      (pmod(PortableHash.asciiPolyHash(concat(lit(j.toString), col("text"))), lit(997L))
        .cast("double") / lit(997.0) - lit(0.5))
    }: _*)
    // The feature projection is the expensive part (8 polynomial hashes
    // over full text) and feeds FOUR consumers (train sample, assignment,
    // the probe side, the re-rank join) — persist it so the scan runs
    // once, the same pattern minHashNearDup uses for its shingle table.
    val e = Tables(s, dir, "documents")
      .select(col("doc_id").as("vec_id"), vec.cast("array<float>").as("embedding"))
      .persist()
    val model = graft.sim.IvfIndex.train(e, k = 16, iters = 0)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    graft.sim.IvfIndex.annTopK(graft.sim.IvfIndex.assign(e, model), queries, model,
        k = 10, nprobe = 4)
      .orderBy("query_id", "rnk")
  }

  /** The q34 oracle shape over the q97 feature CTE: centroids are the
    * first 16 feature vectors, every score/tie-break/probe/re-rank step
    * replayed in SQL.
    */
  val q99Sql: String = {
    val polyHash = graft.queries.QueriesDedup.polyHashSql("CAST(j AS VARCHAR) || text")
    raw"""WITH e AS (
  SELECT doc_id AS vec_id,
         list_transform(range(0, 8),
           j -> CAST(CAST(CAST($polyHash % 997 AS DOUBLE) / 997.0 - 0.5 AS REAL) AS DOUBLE)) AS v
  FROM documents),
c AS (SELECT vec_id AS cid, v AS cv, list_sum(list_transform(v, x -> x * x)) AS cn FROM e WHERE vec_id < 16),
scores AS (SELECT e.vec_id, c.cid,
                  c.cn - 2.0 * list_sum(list_transform(range(1, 9), i -> e.v[i] * c.cv[i])) AS s
           FROM e, c),
assign AS (SELECT vec_id, cid AS cluster FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s, cid) AS rn FROM scores)
           WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, cid AS cluster FROM (
             SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY s, cid) AS rn
             FROM scores WHERE vec_id < 5)
           WHERE rn <= 4),
cand AS (SELECT p.query_id, a.vec_id,
                round(list_sum(list_transform(range(1, 9), i -> e.v[i] * qe.v[i]))
                      / (sqrt(list_sum(list_transform(e.v, x -> x * x)))
                         * sqrt(list_sum(list_transform(qe.v, x -> x * x)))), 6) AS cosine_sim
         FROM probes p
         JOIN assign a ON a.cluster = p.cluster
         JOIN e ON e.vec_id = a.vec_id
         JOIN e qe ON qe.vec_id = p.query_id
         WHERE a.vec_id <> p.query_id),
r AS (SELECT query_id, vec_id, cosine_sim,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS rnk
      FROM cand)
SELECT query_id, vec_id, cosine_sim, rnk FROM r WHERE rnk <= 10 ORDER BY query_id, rnk"""
  }

  private val PngW = 32
  private val PngH = 16

  /** REAL-CODEC multimodal round trip ([[graft.multimodal.Multimodal
    * .PngDecoder]], round 11 — the decoder boundary exercised by an
    * actual codec, not the stub): per document, a deterministic
    * grayscale test pattern (pixel(i) = (doc_id·31 + i) mod 256 at
    * 32×16) is ENCODED to genuine PNG bytes with `javax.imageio`, the
    * payload flows through the standard binary-column pipeline, and
    * [[graft.multimodal.Multimodal.PngDecoder]] DECODES it back —
    * features (width, height, pixel sum, dark-pixel count, max pixel)
    * come from the decoded raster, never from the source arithmetic.
    * PNG is lossless, so the oracle replays the pattern directly: any
    * codec bug, raster misread, or payload corruption on either leg
    * fails the hash. The PNG byte size itself is deliberately NOT in
    * the output (deflate output is encoder-version-dependent — the one
    * non-portable fact of the round trip).
    *
    * Scale: encode+decode are narrow per-row partition maps behind the
    * once-per-partition `open()` (the mapInPandas shape); no shuffle
    * until the final order-by presentation.
    */
  def q222_png_decode(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id")).as[Long]
    val payloads = Multimodal.renderPng(ids, PngW, PngH)
    Multimodal.extractFeatures(payloads, Multimodal.PngDecoder).toDF()
      .select(col("media_id"),
        col("checksum").as("px_sum"),
        col("feature")(0).cast("long").as("width"),
        col("feature")(1).cast("long").as("height"),
        col("feature")(2).cast("long").as("n_dark"),
        col("feature")(3).cast("long").as("px_max"))
      .orderBy("media_id")
  }

  val q222Sql: String =
    raw"""WITH px AS (
  SELECT d.doc_id, (d.doc_id * 31 + t.i) % 256 AS p
  FROM documents d, range(0, ${PngW * PngH}) t(i))
SELECT doc_id AS media_id,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST($PngW AS BIGINT) AS width,
       CAST($PngH AS BIGINT) AS height,
       CAST(sum(CASE WHEN p < 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_dark,
       CAST(max(p) AS BIGINT) AS px_max
FROM px GROUP BY doc_id ORDER BY media_id"""

  /** REAL-CODEC image RESIZE (the brief's multimodal transform, on top
    * of q222's round trip): decode the genuine PNG, 2×2 box-mean
    * downscale ON THE RASTER (integer floor division — replayable
    * arithmetic, where a library scaler's filter kernel would not be),
    * re-encode to PNG with the real codec, decode AGAIN, and take the
    * features from the final decoded raster — so the hash covers two
    * full codec round trips plus the transform. Oracle: the 2×2 block
    * means of the deterministic pattern, in pure integer SQL.
    */
  def q224_png_resize(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id")).as[Long]
    val resized = Multimodal.resizePngHalf(Multimodal.renderPng(ids, PngW, PngH))
    Multimodal.extractFeatures(resized, Multimodal.PngDecoder).toDF()
      .select(col("media_id"),
        col("checksum").as("px_sum"),
        col("feature")(0).cast("long").as("width"),
        col("feature")(1).cast("long").as("height"),
        col("feature")(2).cast("long").as("n_dark"),
        col("feature")(3).cast("long").as("px_max"))
      .orderBy("media_id")
  }

  val q224Sql: String =
    raw"""WITH px AS (
  SELECT d.doc_id,
         ( (d.doc_id * 31 + ((t.j // ${PngW / 2}) * 2) * $PngW + (t.j % ${PngW / 2}) * 2) % 256
         + (d.doc_id * 31 + ((t.j // ${PngW / 2}) * 2) * $PngW + (t.j % ${PngW / 2}) * 2 + 1) % 256
         + (d.doc_id * 31 + ((t.j // ${PngW / 2}) * 2 + 1) * $PngW + (t.j % ${PngW / 2}) * 2) % 256
         + (d.doc_id * 31 + ((t.j // ${PngW / 2}) * 2 + 1) * $PngW + (t.j % ${PngW / 2}) * 2 + 1) % 256
         ) // 4 AS p
  FROM documents d, range(0, ${(PngW / 2) * (PngH / 2)}) t(j))
SELECT doc_id AS media_id,
       CAST(sum(p) AS BIGINT) AS px_sum,
       CAST(${PngW / 2} AS BIGINT) AS width,
       CAST(${PngH / 2} AS BIGINT) AS height,
       CAST(sum(CASE WHEN p < 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_dark,
       CAST(max(p) AS BIGINT) AS px_max
FROM px GROUP BY doc_id ORDER BY media_id"""

  private val WavN = 256

  /** REAL-CODEC audio decode (`javax.sound.sampled`, pure JVM): per
    * document, a deterministic full-range 16-bit PCM pattern is written
    * through the real WAV encoder (`AudioSystem.write` builds the RIFF
    * container) and parsed back through `AudioSystem.
    * getAudioInputStream`; features (sample sum / count / min / max /
    * non-negative count) come from the DECODED samples. PCM is
    * lossless, so the oracle replays the pattern arithmetic — a
    * container-parse or sample-order bug on either leg fails the hash.
    * Same per-partition `open()` amortization shape as every decoder.
    */
  def q225_wav_features(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id")).as[Long]
    val payloads = Multimodal.renderWav(ids, WavN)
    Multimodal.extractFeatures(payloads, Multimodal.WavDecoder).toDF()
      .select(col("media_id"),
        col("checksum").as("s_sum"),
        col("feature")(0).cast("long").as("n_samples"),
        col("feature")(1).cast("long").as("s_min"),
        col("feature")(2).cast("long").as("s_max"),
        col("feature")(3).cast("long").as("n_nonneg"))
      .orderBy("media_id")
  }

  val q225Sql: String =
    raw"""WITH sm AS (
  SELECT d.doc_id, ((d.doc_id * 31 + t.i * 7919) % 4001) - 2000 AS s
  FROM documents d, range(0, $WavN) t(i))
SELECT doc_id AS media_id,
       CAST(sum(s) AS BIGINT) AS s_sum,
       CAST($WavN AS BIGINT) AS n_samples,
       CAST(min(s) AS BIGINT) AS s_min,
       CAST(max(s) AS BIGINT) AS s_max,
       CAST(sum(CASE WHEN s >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonneg
FROM sm GROUP BY doc_id ORDER BY media_id"""

  /** THE MEDIA STORAGE BOUNDARY (round-12 top verdict item): q222/q224/
    * q225 render payloads in-plan — a real pipeline reads blobs written
    * EARLIER, so payload corruption in the storage round trip was
    * invisible to the gate. This query closes it: the PNG payloads are
    * WRITTEN to storage through both shapes a 100 TB multimodal corpus
    * uses — a parquet binary column (payload co-located with metadata)
    * and one blob file per asset read back via Spark's `binaryFile`
    * source (the object-store image-dump shape) — and the features are
    * decoded from the READ-BACK bytes on each leg. Both legs must
    * reproduce q222's oracle exactly; a torn write, mangled binary
    * round trip, or path→id mismatch on either leg fails the hash.
    * MultimodalSpec additionally asserts the decode stage's scans ARE
    * the written tables (no in-plan render lineage).
    */
  def q226_png_storage(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    import s.implicits._
    val out = QueriesSources.tmp("graft_q226_media_", dir)
    graft.core.ArtifactIO.delete(s, out) // fresh store per run
    val ids = Tables(s, dir, "documents").select(col("doc_id")).as[Long]
    // persisted: BOTH storage legs consume the rendered payloads — without
    // the cache the PNG encoder runs twice (guide §1.2), and the two
    // independent writes can then overlap (guide §2.6)
    val payloads = Multimodal.renderPng(ids, PngW, PngH).persist()
    val filesDir = s"$out/files"
    // one .png blob per asset, written executor-side through the Hadoop
    // FileSystem API (ArtifactIO.writeBlobs) — the object-store-safe
    // export shape; MultimodalSpec drives the same writer through the
    // mock:// scheme to execute the non-local branch.
    graft.core.ArtifactIO.inParallel(Seq(
      () => payloads.write.mode("overwrite").parquet(s"$out/parquet"),
      () => graft.core.ArtifactIO.writeBlobs(s, filesDir,
        payloads.select("media_id", "media"), ".png")))
    payloads.unpersist()
    def features(media: DataFrame, leg: String) =
      Multimodal.extractFeatures(media, Multimodal.PngDecoder).toDF()
        .select(lit(leg).as("leg"), col("media_id"),
          col("checksum").as("px_sum"),
          col("feature")(0).cast("long").as("width"),
          col("feature")(1).cast("long").as("height"),
          col("feature")(2).cast("long").as("n_dark"),
          col("feature")(3).cast("long").as("px_max"))
    val fromParquet = s.read.parquet(s"$out/parquet")
    val fromFiles = s.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(filesDir)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.png$", 1).cast("long").as("media_id"),
        col("content").as("media"),
        struct(lit("image/png").as("kind"),
          col("length").cast("long").as("n_bytes")).as("meta"))
    features(fromParquet, "parquet")
      .unionByName(features(fromFiles, "binary_file"))
      .orderBy("leg", "media_id")
  }

  val q226Sql: String =
    raw"""WITH px AS (
  SELECT d.doc_id, (d.doc_id * 31 + t.i) % 256 AS p
  FROM documents d, range(0, ${PngW * PngH}) t(i)),
f AS (
  SELECT doc_id AS media_id,
         CAST(sum(p) AS BIGINT) AS px_sum,
         CAST($PngW AS BIGINT) AS width,
         CAST($PngH AS BIGINT) AS height,
         CAST(sum(CASE WHEN p < 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_dark,
         CAST(max(p) AS BIGINT) AS px_max
  FROM px GROUP BY doc_id),
legs AS (SELECT 'binary_file' AS leg UNION ALL SELECT 'parquet')
SELECT leg, media_id, px_sum, width, height, n_dark, px_max
FROM legs, f ORDER BY leg, media_id"""

  private val JpegQ = 0.95f

  /** THE LOSSY-CODEC LEG (round-12 verdict item 6): real `javax.imageio`
    * JPEG, gating only what survives lossy encode. Two sub-legs per
    * document, joined on media_id:
    *
    *  - BLOCK-CONSTANT at quality 1.0: each 8×8 JPEG block is one value
    *    on a 16-step grid, so the DCT is DC-only with quantization step
    *    1 and the round trip is pixel-exact (MultimodalSpec pins this
    *    exhaustively — the pattern depends only on id mod 256). Gated:
    *    decoded dims + the band-quantized pixel sum (`div 8`, the
    *    quantization replayed inside BOTH engines' arithmetic).
    *
    *  - RAMP at quality 0.95, genuinely lossy: gated facts are the
    *    survivors — decoded dims and the banded error bound
    *    floor(max |decoded − source| / 16) = 0 (measured max error 7,
    *    exhaustive over the 256 pattern classes; a codec swap that
    *    drifts past 15 fails loudly).
    *
    * Full-hash pixel gating stays on the PNG path (q222/q224/q226).
    */
  def q228_jpeg_decode(s: SparkSession, dir: String): DataFrame = {
    import graft.multimodal.Multimodal
    import s.implicits._
    val ids = Tables(s, dir, "documents").select(col("doc_id")).as[Long]
    val blocks = Multimodal.extractFeatures(
      Multimodal.renderJpegBlocks(ids, PngW, PngH), Multimodal.JpegDecoder).toDF()
      .select(col("media_id"),
        col("feature")(0).cast("long").as("width"),
        col("feature")(1).cast("long").as("height"),
        expr("checksum div 8").as("px_sum_q8"))
    val ramp = Multimodal.renderJpegRamp(ids, PngW, PngH, JpegQ)
      .select("media_id", "media")
      .map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val (w, h) = (img.getWidth, img.getHeight)
        var maxErr = 0
        var i = 0
        while (i < w * h) {
          val src = ((id * 31 + i) % 256).toInt
          val dec = img.getRaster.getSample(i % w, i / w, 0)
          if (math.abs(dec - src) > maxErr) maxErr = math.abs(dec - src)
          i += 1
        }
        (id, w.toLong, h.toLong, (maxErr / 16).toLong)
      }.toDF("media_id", "ramp_w", "ramp_h", "ramp_err_q16")
    blocks.join(ramp, Seq("media_id")).orderBy("media_id")
  }

  val q228Sql: String =
    raw"""WITH blk AS (
  SELECT d.doc_id, (d.doc_id * 37 + t.b * 16) % 256 AS v
  FROM documents d, range(0, ${(PngW / 8) * (PngH / 8)}) t(b))
SELECT doc_id AS media_id,
       CAST($PngW AS BIGINT) AS width,
       CAST($PngH AS BIGINT) AS height,
       CAST((64 * sum(v)) // 8 AS BIGINT) AS px_sum_q8,
       CAST($PngW AS BIGINT) AS ramp_w,
       CAST($PngH AS BIGINT) AS ramp_h,
       CAST(0 AS BIGINT) AS ramp_err_q16
FROM blk GROUP BY doc_id ORDER BY media_id"""
}
