package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ArtifactIO, CommitLog}

/** DELTA-LOG storage for the version-chained streaming sink states
  * (aggMaint / joinMaint / boilerMaint / hllMaint): each micro-batch
  * writes only its DELTA — the rows it touched — instead of a full
  * state copy, so per-batch IO is O(batch), not O(state). The current
  * state is reconstructed at read time by MERGING the newest base
  * snapshot with the committed deltas above it (the LSM read path),
  * and periodic [[compact]]ion folds old deltas into a new base so the
  * merge fan-in stays bounded. At 100 TB state this is the difference
  * between a sink that writes megabytes per batch and one that
  * rewrites the warehouse.
  *
  * On-disk layout under `outDir`:
  *  - `v=<batchId>/<table>/…`        — the batch's delta, one subdir per
  *    state table (a sink may write only the tables its side touches);
  *  - `base_v=<id>/<table>/…`        — a compacted snapshot of the state
  *    AS OF version `id` INCLUSIVE (supersedes every delta ≤ id);
  *  - `_LAYOUT`                      — the table descriptors (name, merge
  *    kind, keys), written once so a generic janitor can compact without
  *    knowing the sink type;
  *  - every version/base directory is published by
  *    [[ArtifactIO.CommitMarker]] AFTER its tables land — a crash
  *    between writes leaves an uncommitted directory no reader selects.
  *
  * Replay contract (unchanged from the full-copy era): a redelivered
  * batch recomputes its delta against the state AS OF versions < its
  * id ([[asOf]] with a cutoff) and overwrites its own delta directory.
  * [[writeDelta]] clears the version's commit marker BEFORE the
  * overwrite, so a crash mid-replay also leaves an uncommitted
  * version — the torn-version invariant holds inside the replay
  * window too (the round-9 ADVICE finding).
  *
  * Merge kinds — how a table's base + delta rows collapse to state:
  *  - [[Lww]]: keyed snapshot, newest VERSION wins per key (upsert
  *    streams; version order is delivery order, so this is
  *    last-writer-wins with a deterministic total order);
  *  - [[Sum]]: additive table — state is the per-key SUM of all delta
  *    contributions (± delta maintenance; a base is just a big delta);
  *  - [[SetU]]: a key SET — state is the distinct union (served-ids);
  *  - [[HllMax]]: HLL register arrays — elementwise max merge
  *    (associative, commutative, idempotent).
  */
object DeltaState {
  sealed trait Kind { def keys: Seq[String] }
  final case class Lww(keys: Seq[String]) extends Kind
  final case class Sum(keys: Seq[String]) extends Kind
  final case class SetU(keys: Seq[String]) extends Kind
  final case class HllMax(keys: Seq[String], regs: String) extends Kind
  final case class Table(name: String, kind: Kind)

  val DeltaPrefix = "v="
  val BasePrefix = "base_v="
  val LayoutFile = "_LAYOUT"
  private val layoutWriteLock = new Object

  /** Write one batch's delta tables as version `batchId` and publish
    * them with the commit marker. Clears a pre-existing marker FIRST
    * (replay overwrite window — see the object doc). The layout file
    * is written on the first batch so [[compact]] stays generic.
    */
  def writeDelta(spark: SparkSession, outDir: String, batchId: Long,
      layout: Seq[Table], tables: Seq[(String, DataFrame)]): Unit = {
    val vdir = s"$outDir/$DeltaPrefix$batchId"
    CommitLog.begin(spark, vdir)
    // sibling delta tables are independent writes under one marker —
    // overlap them (ArtifactIO.inParallel; the marker still publishes
    // only after every table has landed)
    ArtifactIO.inParallel(tables.map { case (name, df) =>
      () => df.write.mode("overwrite").parquet(s"$vdir/$name")
    })
    // check-then-write under a JVM lock: two version commits of ONE chain
    // may themselves run concurrently (ArtifactIO.inParallel callers), and
    // racing renames onto the same _LAYOUT destination throw on local FS.
    // Content is identical either way — the lock just serializes the lay.
    layoutWriteLock.synchronized {
      if (!ArtifactIO.exists(spark, s"$outDir/$LayoutFile"))
        ArtifactIO.writeAtomicString(spark, s"$outDir/$LayoutFile", layoutString(layout))
    }
    CommitLog.publish(spark, vdir)
  }

  /** The state of `table` as of versions STRICTLY BELOW `cutoffExclusive`
    * (None = current state): newest committed base below the cutoff,
    * merged with the committed deltas between it and the cutoff. None
    * when no committed piece carries the table (e.g. the right snapshot
    * before any right-side batch).
    */
  def asOf(spark: SparkSession, outDir: String, table: Table,
      cutoffExclusive: Option[Long] = None): Option[DataFrame] = {
    val pieces = piecesFor(spark, outDir, table.name, cutoffExclusive)
    if (pieces.isEmpty) None
    else {
      val u = pieces.map { case (v, path) =>
        spark.read.parquet(path).withColumn("__dsv", lit(v))
      }.reduce(_ unionByName _)
      Some(applyKind(table.kind, u))
    }
  }

  /** Highest committed version id (base or delta) — the "current"
    * version readers see. None when nothing is committed.
    */
  def latest(spark: SparkSession, outDir: String): Option[Long] =
    (ArtifactIO.committedVersions(spark, outDir, BasePrefix) ++
      ArtifactIO.committedVersions(spark, outDir, DeltaPrefix)).sorted.lastOption

  /** CHANGE DATA FEED between two versions — the delta-log's second
    * dividend after time travel: the per-key row-level changes
    * (insert / update / delete, with pre- and post-images) the state
    * underwent from version `fromV` (exclusive; pass −1 for "since
    * empty") to `toV` (inclusive). Downstream consumers — cache
    * invalidation, incremental re-index, audit feeds — read O(changes)
    * instead of re-diffing two O(state) snapshots themselves.
    *
    * Read cost: when every committed piece in `(fromV, toV]` is still a
    * DELTA, the touched-key set comes from those delta files alone and
    * the pre/post states are probed ONLY at the touched keys (a
    * broadcast-scale semi-join for typical batches) — O(deltas in
    * range) + two keyed state lookups, never a full-state diff. When
    * compaction has folded part of the range into a base snapshot, the
    * per-version slices are gone and the feed falls back to a full
    * pre-vs-post outer diff — the same result, at O(state) cost (the
    * documented retention trade every CDF system has: change feeds
    * require retained commits; spec-pinned equal on randomized
    * schedules).
    *
    * Returns None when either endpoint is unreconstructible: `toV`
    * ahead of nothing committed, or `fromV ≥ 0` below the compaction
    * floor (no committed piece ≤ fromV while a folded base above it
    * exists — the state at fromV is unknowable, and treating it as
    * empty would mislabel every change as an insert; same refusal
    * contract as the as-of reads). Output: key columns, `change`
    * ('insert' | 'update' | 'delete'), and `pre_<c>` / `post_<c>` for
    * every value column. Unchanged keys are absent; a delete cannot
    * arise from the current merge kinds (no tombstones) but is
    * classified for forward compatibility.
    */
  def changesBetween(spark: SparkSession, outDir: String, table: Table,
      fromV: Long, toV: Long): Option[DataFrame] = {
    val bases = ArtifactIO.committedVersions(spark, outDir, BasePrefix)
    val deltas = ArtifactIO.committedVersions(spark, outDir, DeltaPrefix)
    val post0 = asOf(spark, outDir, table, Some(toV + 1))
    if (post0.isEmpty) return None
    val havePieceAtOrBelowFrom = (bases ++ deltas).exists(_ <= fromV)
    if (fromV >= 0 && !havePieceAtOrBelowFrom && bases.exists(_ > fromV)) return None
    val pre0 = if (fromV < 0) None else asOf(spark, outDir, table, Some(fromV + 1))
    val post = post0.get
    val keys = table.kind.keys
    val valCols = post.columns.filterNot(keys.contains).toSeq
    val empty = post.filter(lit(false))
    // Sliced path: every piece in range is a delta → touched keys from
    // the delta files alone; else full-diff fallback (see scaladoc).
    val rangeDeltas = deltas.filter(v => v > fromV && v <= toV)
    val rangeBases = bases.filter(v => v > fromV && v <= toV)
    val touched: Option[DataFrame] =
      if (rangeBases.nonEmpty) None
      else {
        val dirs = rangeDeltas.map(v => s"$outDir/$DeltaPrefix$v/${table.name}")
          .filter(ArtifactIO.exists(spark, _))
        if (dirs.isEmpty) Some(empty.select(keys.map(col): _*))
        else Some(dirs.map(spark.read.parquet(_).select(keys.map(col): _*))
          .reduce(_ unionByName _).distinct())
      }
    def restrict(df: DataFrame): DataFrame = touched match {
      case Some(t) => df.join(t, keys, "left_semi")
      case None => df
    }
    val p = restrict(pre0.getOrElse(empty))
      .select((keys.map(col) :+ lit(1).as("__pre")) ++
        valCols.map(c => col(c).as(s"pre_$c")): _*)
    val q = restrict(post)
      .select((keys.map(col) :+ lit(1).as("__post")) ++
        valCols.map(c => col(c).as(s"post_$c")): _*)
    val changed: Column =
      if (valCols.isEmpty) lit(false)
      else valCols.map(c => !(col(s"pre_$c") <=> col(s"post_$c"))).reduce(_ || _)
    val j = p.join(q, keys, "full_outer")
      .withColumn("change",
        when(col("__post").isNull, lit("delete"))
          .when(col("__pre").isNull, lit("insert"))
          .when(changed, lit("update"))
          .otherwise(lit("none")))
      .filter(col("change") =!= "none")
    Some(j.select((keys.map(col) :+ col("change")) ++
      valCols.flatMap(c => Seq(col(s"pre_$c"), col(s"post_$c"))): _*))
  }

  private def piecesFor(spark: SparkSession, outDir: String, name: String,
      cutoff: Option[Long]): Seq[(Long, String)] = {
    val base = ArtifactIO.committedVersions(spark, outDir, BasePrefix)
      .filter(v => cutoff.forall(v < _)).lastOption
    val deltas = ArtifactIO.committedVersions(spark, outDir, DeltaPrefix)
      .filter(v => cutoff.forall(v < _) && base.forall(v > _))
    (base.map(v => v -> s"$outDir/$BasePrefix$v/$name").toSeq ++
      deltas.map(v => v -> s"$outDir/$DeltaPrefix$v/$name"))
      .filter { case (_, p) => ArtifactIO.exists(spark, p) }
  }

  private def applyKind(kind: Kind, u: DataFrame): DataFrame = {
    val orig = u.columns.filterNot(_ == "__dsv").toSeq
    val out = kind match {
      case Lww(keys) =>
        // version ids are distinct across pieces, so the rank-1 row per
        // key is unique — deterministic last-writer-wins
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*).orderBy(col("__dsv").desc)
        u.withColumn("__dsrn", row_number().over(w)).filter(col("__dsrn") === 1)
      case Sum(keys) =>
        val others = orig.filterNot(keys.contains)
        u.groupBy(keys.map(col): _*)
          .agg(sum(others.head).as(others.head),
            others.tail.map(c => sum(c).as(c)): _*)
      case SetU(_) =>
        u.select(orig.map(col): _*).distinct()
      case HllMax(keys, regs) =>
        // fold the per-version register arrays by elementwise max; the
        // collect_list per group is (#pieces × m) values — bounded by
        // the compaction cadence, independent of stream length
        u.groupBy(keys.map(col): _*)
          .agg(collect_list(col(regs)).as("__dsl"))
          .select(keys.map(col) :+
            aggregate(expr("slice(__dsl, 2, size(__dsl))"),
              col("__dsl").getItem(0),
              (acc: Column, r: Column) => zip_with(acc, r, (a, b) => greatest(a, b)))
              .as(regs): _*)
    }
    out.select(orig.map(col): _*)
  }

  /** Fold old versions into a base snapshot and delete the superseded
    * pieces, keeping the newest `keep` reconstruction points (the
    * second-newest becomes the base for keep = 2). `keep >= 2` BY
    * CONTRACT: a batch whose version committed but whose checkpoint
    * offset didn't is redelivered and rebuilds from the state below its
    * own id — keep = 1 would fold/delete exactly that predecessor.
    * Also removes crash debris: uncommitted version/base directories
    * older than the newest committed id (unreachable by any replay);
    * an uncommitted directory AT/AFTER the newest committed id is the
    * in-flight batch a retry will overwrite — never touched.
    *
    * Crash-safe without coordination: the base is written to its own
    * directory and published by the commit marker BEFORE any delete;
    * readers that race the compaction see either chain, both of which
    * reconstruct the identical state (deltas ≤ base id are superseded,
    * not required). Returns the deleted ids, for observability.
    */
  def compact(spark: SparkSession, outDir: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 2,
      s"sink-state retention needs keep >= 2 (replay-predecessor window), got $keep")
    val bases = ArtifactIO.committedVersions(spark, outDir, BasePrefix)
    val deltas = ArtifactIO.committedVersions(spark, outDir, DeltaPrefix)
    val all = (bases ++ deltas).distinct.sorted
    val newest = all.lastOption
    def debrisOf(prefix: String): Seq[Long] =
      ArtifactIO.list(spark, outDir)
        .filter(_.startsWith(prefix))
        .map(_.stripPrefix(prefix))
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        .filter(id => newest.exists(id < _) &&
          !ArtifactIO.isCommitted(spark, s"$outDir/$prefix$id"))
        .map { id => ArtifactIO.delete(spark, s"$outDir/$prefix$id"); id }
    val debris = debrisOf(DeltaPrefix) ++ debrisOf(BasePrefix)
    val layout = readLayout(spark, outDir)
    val folded =
      if (all.size < keep || layout.isEmpty) Seq.empty
      else {
        val target = all(all.size - keep)
        if (bases.contains(target) && all.head == target) Seq.empty // already folded
        else {
          val baseDir = s"$outDir/$BasePrefix$target"
          ArtifactIO.delete(spark, baseDir) // crashed previous attempt
          // sibling table folds are independent writes under one base
          // marker — overlap them (guide §2.6), publish still after all
          ArtifactIO.inParallel(layout.get.map { t =>
            () => asOf(spark, outDir, t, Some(target + 1)).foreach(
              _.write.mode("overwrite").parquet(s"$baseDir/${t.name}"))
          })
          CommitLog.publish(spark, baseDir)
          deltas.filter(_ <= target).map { id =>
            ArtifactIO.delete(spark, s"$outDir/$DeltaPrefix$id"); id
          } ++ bases.filter(_ < target).map { id =>
            ArtifactIO.delete(spark, s"$outDir/$BasePrefix$id"); id
          }
        }
      }
    (debris ++ folded).distinct.sorted
  }

  private[streaming] def layoutString(tables: Seq[Table]): String =
    tables.map { t =>
      t.kind match {
        case Lww(keys) => s"${t.name}|lww|${keys.mkString(",")}|"
        case Sum(keys) => s"${t.name}|sum|${keys.mkString(",")}|"
        case SetU(keys) => s"${t.name}|set|${keys.mkString(",")}|"
        case HllMax(keys, regs) => s"${t.name}|hllmax|${keys.mkString(",")}|$regs"
      }
    }.mkString("\n")

  private[streaming] def readLayout(spark: SparkSession, outDir: String): Option[Seq[Table]] = {
    if (!ArtifactIO.exists(spark, s"$outDir/$LayoutFile")) None
    else Some(ArtifactIO.readString(spark, s"$outDir/$LayoutFile")
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val parts = line.split("\\|", -1)
        val (name, kindName, keys, extra) =
          (parts(0), parts(1), parts(2).split(",").toSeq.filter(_.nonEmpty), parts(3))
        val kind = kindName match {
          case "lww" => Lww(keys)
          case "sum" => Sum(keys)
          case "set" => SetU(keys)
          case "hllmax" => HllMax(keys, extra)
          case other => sys.error(s"unknown delta-state kind '$other' in $outDir/$LayoutFile")
        }
        Table(name, kind)
      })
  }
}
