package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Incremental view maintenance for an algebraic aggregate (count + sum per
 * key), maintained LSM-style so each micro-batch costs O(delta), never
 * O(view):
 *
 *   - every batch appends its PARTIAL aggregate (one row per touched key)
 *     as a delta file set under the store — count and sum are commutative
 *     monoids, so partials merge associatively in any order;
 *   - [[read]] is merge-on-read: base ∪ unfolded deltas → one groupBy.
 *     Read amplification grows with the delta count, which is why
 *   - [[compact]] folds base + deltas into a new base generation —
 *     amortized O(view), run on whatever cadence read amplification
 *     warrants (the LSM tradeoff made explicit).
 *
 * Crash safety without a transactional store:
 *   - a delta dir is named by its micro-batch id (+ a lineage tag, see
 *     [[applyBatch]]); the naming scheme is part of the store format — a
 *     store must be drained or compacted before changing it;
 *   - a delta is COMMITTED by this module's own `_GRAFT_COMMIT` marker,
 *     written after the parquet data — independent of whether the cluster's
 *     output committer writes `_SUCCESS` markers. A dir without the marker
 *     is torn and gets rewritten on replay, never read;
 *   - [[applyBatch]] treats a batch as already applied when its delta dir
 *     is committed OR its name appears in the current base's manifest (a
 *     compaction may have folded the delta and deleted the dir before the
 *     stream committed its offsets — replay must still no-op);
 *   - a base generation carries a `_FOLDED` manifest naming every delta it
 *     (or any ancestor base) absorbed — retained across compactions even
 *     after the delta dirs are deleted (bounded per lineage, see
 *     [[compact]]), because the manifest is the only replay-no-op evidence
 *     once a dir is gone;
 *     [[read]] resolves the base via an atomically renamed pointer file and
 *     skips manifest-listed deltas, so folded deltas delete lazily — a
 *     crash anywhere in [[compact]] resolves to a correct view.
 *
 * The 100 TB layout is [[ShardedIncrementalView]].
 *
 * The maintained aggregate is pluggable ([[ViewAggregate]]): any
 * commutative monoid whose partials merge associatively works — count+sum
 * ([[CountSumAgg]], the default everywhere for compatibility) and
 * latest-version-per-key ([[LatestAgg]], the streaming CDC snapshot) ship
 * here. The store format is the PARTIAL schema, so one store must stick to
 * one aggregate for its lifetime.
 */
trait ViewAggregate extends Serializable {
  /** One batch → one row per touched key (the delta's schema). */
  def partial(batch: DataFrame, keyCols: Seq[String]): DataFrame
  /** Fold frames of the partial schema: same schema in and out. */
  def merge(parts: DataFrame, keyCols: Seq[String]): DataFrame
}

/** (count, sum) per key — the original incremental-view aggregate. */
case class CountSumAgg(valueCol: String) extends ViewAggregate {
  def partial(batch: DataFrame, keyCols: Seq[String]): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col(valueCol)).as("sum_value"))
  def merge(parts: DataFrame, keyCols: Seq[String]): DataFrame =
    parts.groupBy(keyCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_value")).as("sum_value"))
}

/**
 * Latest version per key — the CDC-snapshot monoid (max over the
 * (ordCols, payload) struct is associative and commutative, ties broken by
 * the payload's field order; make ordCols total — e.g. (ts, change_id) —
 * and ties never matter). Tombstones are RETAINED in the store (a delete
 * is information: it must beat earlier upserts arriving late in a replay);
 * [[graft.operators.Cdc.snapshotOf]] filters them at read. Per batch this
 * is one partial-aggregatable max — a hot key's versions collapse
 * map-side, and the delta carries ONE row per touched key.
 */
case class LatestAgg(ordCols: Seq[String], payloadCols: Seq[String])
    extends ViewAggregate {
  private def latest = col("__latest")
  def partial(batch: DataFrame, keyCols: Seq[String]): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(max(struct((ordCols ++ payloadCols).map(col): _*)).as("__latest"))
  def merge(parts: DataFrame, keyCols: Seq[String]): DataFrame =
    parts.groupBy(keyCols.map(col): _*).agg(max(latest).as("__latest"))
}

/**
 * Sketch-backed corpus-health monoid: the per-source dashboard of
 * [[graft.operators.DataQuality.corpusHealth]] maintained INCREMENTALLY —
 * each batch contributes one partial row per touched source (counts/sums
 * plus mergeable HLL sketches for distinct content/language and a KLL
 * sketch for the char-length distribution), so the dashboard over a
 * 100 TB corpus updates O(delta) per batch with NO corpus rescans. The
 * price: the dup/lang/median columns become sketch estimates (HLL ≈0.8%
 * rel. err at the default lgK=12, exact while a source stays under the
 * sparse threshold; KLL rank error ≈1.7% at k=200, exact under k values).
 * Counts and sums stay exact. Finalize store rows with
 * [[CorpusHealthAgg.finish]].
 */
case class CorpusHealthAgg(textCol: String = "text", langCol: String = "lang",
    nCharsCol: String = "n_chars") extends ViewAggregate {
  import graft.functions.KllExpressions
  def partial(batch: DataFrame, keyCols: Seq[String]): DataFrame =
    batch.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(col(nCharsCol)).as("total_chars"),
      sum(size(graft.operators.TextAnalysis.tokens(col(textCol))).cast("long"))
        .as("total_tokens"),
      hll_sketch_agg(md5(col(textCol))).as("content_hll"),
      hll_sketch_agg(col(langCol)).as("lang_hll"),
      KllExpressions.kllSketchAgg(col(nCharsCol).cast("double")).as("chars_kll"))
  def merge(parts: DataFrame, keyCols: Seq[String]): DataFrame =
    parts.groupBy(keyCols.map(col): _*).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("total_chars")).as("total_chars"),
      sum(col("total_tokens")).as("total_tokens"),
      hll_union_agg(col("content_hll")).as("content_hll"),
      hll_union_agg(col("lang_hll")).as("lang_hll"),
      KllExpressions.kllMergeAgg(col("chars_kll")).as("chars_kll"))
}

object CorpusHealthAgg {
  import graft.functions.KllExpressions
  /** Store partials → the dashboard columns ([[graft.operators.DataQuality
   * .corpusHealth]] shape; sketch-derived columns carry an `_est` suffix).
   * `dup_docs_est` clamps at 0 — HLL can estimate slightly ABOVE an exact
   * small count. */
  def finish(view: DataFrame, sourceCol: String = "source"): DataFrame =
    view.select(col(sourceCol),
      col("n_docs"),
      greatest(lit(0L), col("n_docs") -
        round(hll_sketch_estimate(col("content_hll"))).cast("long"))
        .as("dup_docs_est"),
      round(hll_sketch_estimate(col("lang_hll"))).cast("long").as("n_langs_est"),
      col("total_chars"),
      floor(col("total_chars").cast("double") / col("n_docs"))
        .cast("long").as("avg_chars_floor"),
      KllExpressions.kllQuantile(col("chars_kll"), 0.5).as("p50_chars_est"),
      col("total_tokens"))
}

object IncrementalView {

  private[streaming] val PTR = "_CURRENT_BASE"
  private[streaming] val MANIFEST = "_FOLDED"
  private[streaming] val COMMIT = "_GRAFT_COMMIT"

  private[streaming] def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[streaming] def readSmallFile(spark: SparkSession, p: Path): String = {
    val in = fs(spark, p.toString).open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
    finally in.close()
  }

  private[streaming] def writeSmallFile(spark: SparkSession, p: Path, content: String): Unit = {
    val out = fs(spark, p.toString).create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Current base generation name (None before the first compaction). */
  def currentBaseName(spark: SparkSession, storeDir: String): Option[String] = {
    val ptr = new Path(storeDir, PTR)
    if (!fs(spark, storeDir).exists(ptr)) None
    else Some(readSmallFile(spark, ptr))
  }

  /** Delta names already folded into the current base (empty when no base). */
  private def foldedDeltas(spark: SparkSession, storeDir: String): Set[String] =
    currentBaseName(spark, storeDir).map { b =>
      val m = new Path(new Path(storeDir, b), MANIFEST)
      if (fs(spark, storeDir).exists(m))
        readSmallFile(spark, m).split("\n").filter(_.nonEmpty).toSet
      else Set.empty[String]
    }.getOrElse(Set.empty)

  /** All delta dirs on disk, oldest first. */
  private def deltaDirs(spark: SparkSession, storeDir: String): Seq[Path] = {
    val f = fs(spark, storeDir)
    val root = new Path(storeDir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("delta_")).toSeq.sortBy(_.getName)
  }

  /** Deltas that still count toward the view: committed on disk and not in
   * the current base's manifest. */
  private def liveDeltas(spark: SparkSession, storeDir: String): Seq[Path] = {
    val f = fs(spark, storeDir)
    val folded = foldedDeltas(spark, storeDir)
    deltaDirs(spark, storeDir)
      .filterNot(p => folded(p.getName))
      .filter(p => f.exists(new Path(p, COMMIT)))
  }

  private def deltaName(batchId: Long, lineage: String): String = {
    val tag = if (lineage.isEmpty) "" else s"${lineage}_"
    f"delta_$tag%s$batchId%020d"
  }

  /** Write an ALREADY-PARTIAL delta frame (schema: keys..., n_rows,
   * sum_value) with replay idempotence. Returns false on a replay no-op. */
  private[streaming] def writePartialDelta(partialDf: DataFrame, batchId: Long,
      storeDir: String, lineage: String): Boolean = {
    val spark = partialDf.sparkSession
    val f = fs(spark, storeDir)
    val name = deltaName(batchId, lineage)
    val delta = new Path(storeDir, name)
    // already applied if the committed dir exists OR a compaction absorbed
    // it (manifest) and deleted the dir before our offsets committed
    if (f.exists(new Path(delta, COMMIT))) return false
    if (foldedDeltas(spark, storeDir).contains(name)) return false
    if (f.exists(delta)) f.delete(delta, true) // torn write: redo
    partialDf.write.mode("errorifexists").parquet(delta.toString)
    writeSmallFile(spark, new Path(delta, COMMIT), "")
    true
  }

  /** Apply one micro-batch: append its partial-aggregate delta unless this
   * batchId was already applied (replay no-op — see [[writePartialDelta]]).
   * Usable standalone for batch-incremental runs.
   *
   * `lineage` scopes the idempotence key: batch ids restart at 0 for every
   * distinct streaming query, so two queries feeding one store would
   * collide on bare ids and silently swallow each other's batches —
   * [[start]] passes a hash of the checkpoint path (stable across restarts
   * of the SAME query, distinct across queries). */
  def applyBatch(batch: DataFrame, batchId: Long, keyCols: Seq[String],
      valueCol: String, storeDir: String, lineage: String = ""): Unit =
    applyBatch(batch, batchId, keyCols, CountSumAgg(valueCol), storeDir, lineage)

  /** [[applyBatch]] for an arbitrary [[ViewAggregate]]. */
  def applyBatch(batch: DataFrame, batchId: Long, keyCols: Seq[String],
      agg: ViewAggregate, storeDir: String, lineage: String): Unit =
    writePartialDelta(agg.partial(batch, keyCols), batchId, storeDir, lineage)

  /** Merge the given parts (base and/or deltas) into the view contents. */
  private def mergeParts(spark: SparkSession, parts: Seq[Path],
      keyCols: Seq[String], storeDir: String, agg: ViewAggregate): DataFrame = {
    if (parts.isEmpty)
      throw new IllegalStateException(s"incremental view at $storeDir has no data yet")
    agg.merge(parts.map(p => spark.read.parquet(p.toString)).reduce(_ unionByName _),
      keyCols)
  }

  /** Current view contents: base generation (if any) merged with all live
   * deltas. */
  def read(spark: SparkSession, storeDir: String, keyCols: Seq[String],
      agg: ViewAggregate = CountSumAgg("")): DataFrame =
    mergeParts(spark,
      currentBaseName(spark, storeDir).map(b => new Path(storeDir, b)).toSeq ++
        liveDeltas(spark, storeDir),
      keyCols, storeDir, agg)

  /**
   * Fold base + live deltas into a new base generation. Step order:
   * (1) write the new base parquet + its `_FOLDED` manifest, (2) atomically
   * repoint `_CURRENT_BASE` (overwrite rename — no window without a
   * pointer), (3) delete the folded deltas and the old base. A crash before
   * (2) leaves the old pointer (orphan new-base dir GC'd at the next
   * compact); a crash after (2) leaves manifest-listed deltas on disk,
   * which read() and replay already skip.
   *
   * The new base is built from the EXPLICIT snapshot of folded deltas — a
   * delta appended concurrently (streaming continues during an offline
   * compaction) is neither absorbed nor listed, so it stays correctly live.
   */
  def compact(spark: SparkSession, storeDir: String, keyCols: Seq[String],
      manifestRetention: Int = 1000, agg: ViewAggregate = CountSumAgg("")): Unit = {
    val f = fs(spark, storeDir)
    val old = currentBaseName(spark, storeDir)
    // GC: base dirs that are not the current pointer are orphans of a
    // pre-repoint crash — unreferenced, safe to drop. Only when a pointer
    // exists: with no pointer there is no way to tell orphan from base.
    if (old.isDefined && f.exists(new Path(storeDir))) {
      f.listStatus(new Path(storeDir)).map(_.getPath)
        .filter(p => p.getName.startsWith("base_") && !old.contains(p.getName))
        .foreach(p => f.delete(p, true))
    }
    val folded = liveDeltas(spark, storeDir)
    if (folded.isEmpty) return // nothing new to fold (or nothing at all)
    // monotonic generation counter (parse the old name, +1) — deterministic
    // and collision-free, unlike a wall-clock stamp
    val nextGen = old.map(_.stripPrefix("base_").toLong + 1).getOrElse(0L)
    val gen = f"base_$nextGen%020d"
    val genPath = new Path(storeDir, gen)
    mergeParts(spark, old.map(b => new Path(storeDir, b)).toSeq ++ folded,
        keyCols, storeDir, agg)
      .write.mode("errorifexists").parquet(genPath.toString)
    // CUMULATIVE manifest: carry ALL prior entries forward, even those whose
    // delta dirs are already gone. The manifest is the ONLY replay-no-op
    // evidence once a folded delta's dir is deleted — if a batch is folded
    // before the stream commits its offsets and a second compaction then
    // dropped the entry (the old "dir still exists" filter), the restarted
    // stream would find neither dir nor manifest entry and re-append the
    // delta, silently double-counting. Boundedness comes from a per-lineage
    // retention window instead: streaming replay can only concern batches at
    // or after the last uncommitted offset, so keeping the newest
    // `manifestRetention` folded batch ids per lineage covers any real
    // replay while the manifest stays O(lineages × retention). Entries whose
    // dirs still linger on disk are always kept — read() must skip them.
    val onDisk = deltaDirs(spark, storeDir).map(_.getName).toSet
    val prior = foldedDeltas(spark, storeDir)
    val lingering = prior.filter(onDisk)
    val all = prior ++ folded.map(_.getName)
    // group by the lineage tag (name = delta_[lineage_]<20-digit id>); the
    // zero-padded id makes lexicographic order == batch order per lineage
    val retained = all.groupBy(n => n.stripSuffix(n.takeRight(20))).iterator.flatMap {
      case (_, names) => names.toSeq.sorted.takeRight(manifestRetention)
    }.toSet ++ lingering
    val manifest = retained.toSeq.sorted
    writeSmallFile(spark, new Path(genPath, MANIFEST), manifest.mkString("\n"))
    val tmp = new Path(storeDir, s".$PTR.tmp")
    writeSmallFile(spark, tmp, gen)
    // ATOMIC pointer swap: FileContext.rename(OVERWRITE) — a plain
    // delete-then-rename has a window with NO pointer, after which the
    // orphan GC above could eat the only valid base
    org.apache.hadoop.fs.FileContext
      .getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(storeDir, PTR), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    (folded ++ lingering.map(n => new Path(storeDir, n))).foreach(p => f.delete(p, true))
    old.foreach(o => f.delete(new Path(storeDir, o), true))
  }

  /** Wire into a stream: one delta append per micro-batch, idempotence
   * scoped by the checkpoint identity (see [[applyBatch]]). Compaction is
   * the caller's cadence decision (e.g. every N batches or offline). */
  def start(stream: DataFrame, keyCols: Seq[String], valueCol: String,
      storeDir: String, checkpoint: String): StreamingQuery =
    start(stream, keyCols, CountSumAgg(valueCol), storeDir, checkpoint)

  /** [[start]] for an arbitrary [[ViewAggregate]]. */
  def start(stream: DataFrame, keyCols: Seq[String], agg: ViewAggregate,
      storeDir: String, checkpoint: String): StreamingQuery = {
    val lineage = lineageOf(checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, id, keyCols, agg, storeDir, lineage)
      }
      .start()
  }

  private[streaming] def lineageOf(checkpoint: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
}

/**
 * The 100 TB layout of [[IncrementalView]]: the store is split into
 * `shards` key-hash subdirectories, each an independent IncrementalView.
 * What that buys at scale:
 *
 *   - COMPACTION IS PER-SHARD: folding only rewrites shards that actually
 *     accumulated deltas — compaction cost ∝ touched data, not view size
 *     (a view with a hot key range compacts that range's shard, the cold
 *     99% of the store is never rewritten);
 *   - per-shard parquet stays small enough for single-task rewrites, so
 *     compaction parallelizes trivially across shards.
 *
 * A micro-batch is pre-aggregated ONCE (keyed by shard + keys, persisted),
 * then each touched shard's slice of the small partial frame is written —
 * per-shard cost is a filter over already-aggregated rows, not a re-scan
 * of the batch. Replay idempotence is inherited per shard: a crash
 * mid-batch leaves committed deltas in some shards — the replay's
 * per-shard check skips exactly those.
 */
object ShardedIncrementalView {
  import org.apache.spark.sql.Column

  def shardOf(keyCols: Seq[String], shards: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(shards))

  private def shardDir(storeDir: String, s: Int): String =
    new Path(storeDir, f"shard=$s%05d").toString

  /** Apply one micro-batch across shards (only touched shards write). */
  def applyBatch(batch: DataFrame, batchId: Long, keyCols: Seq[String],
      valueCol: String, storeDir: String, shards: Int, lineage: String = ""): Unit =
    applyBatch(batch, batchId, keyCols, CountSumAgg(valueCol), storeDir, shards, lineage)

  /** [[applyBatch]] for an arbitrary [[ViewAggregate]]. */
  def applyBatch(batch: DataFrame, batchId: Long, keyCols: Seq[String],
      agg: ViewAggregate, storeDir: String, shards: Int, lineage: String): Unit = {
    // one aggregation pass over the batch; everything after runs on the
    // (small) partial frame
    val partials = agg.partial(
        batch.withColumn("__shard", shardOf(keyCols, shards)),
        "__shard" +: keyCols)
      .persist()
    try {
      val touched = partials.select(col("__shard")).distinct()
        .collect().map(_.getLong(0).toInt).sorted
      touched.foreach { s =>
        IncrementalView.writePartialDelta(
          partials.filter(col("__shard") === s).drop("__shard"),
          batchId, shardDir(storeDir, s), lineage)
      }
    } finally partials.unpersist(blocking = false)
  }

  /** Current view: union of the shards that hold data. */
  def read(spark: SparkSession, storeDir: String, keyCols: Seq[String],
      shards: Int, agg: ViewAggregate = CountSumAgg("")): DataFrame = {
    val parts = (0 until shards).flatMap { s =>
      try Some(IncrementalView.read(spark, shardDir(storeDir, s), keyCols, agg))
      catch { case _: IllegalStateException => None } // shard never touched
    }
    if (parts.isEmpty)
      throw new IllegalStateException(s"sharded view at $storeDir has no data yet")
    parts.reduce(_ unionByName _)
  }

  /** Compact ONLY shards with outstanding deltas (each shard's compact()
   * no-ops cheaply otherwise). Returns the shard ids actually folded. */
  def compactTouched(spark: SparkSession, storeDir: String, keyCols: Seq[String],
      shards: Int, agg: ViewAggregate = CountSumAgg("")): Seq[Int] =
    (0 until shards).filter { s =>
      val dir = shardDir(storeDir, s)
      val before = baseGeneration(spark, dir)
      IncrementalView.compact(spark, dir, keyCols, agg = agg)
      baseGeneration(spark, dir) != before
    }

  /** Current base-generation name of a shard (None when never compacted) —
   * a monitoring hook: generation churn per shard is the compaction-cost
   * signal, and tests use it to assert cold shards are never rewritten. */
  def baseGeneration(spark: SparkSession, dir: String): Option[String] =
    IncrementalView.currentBaseName(spark, dir)
}
