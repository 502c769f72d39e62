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
 *   - a delta dir is named by its micro-batch id; [[applyBatch]] treats an
 *     existing COMPLETE delta (`_SUCCESS` present) as "already applied"
 *     (replay no-op) and rewrites a torn one — so a crash between "delta
 *     written" and "offsets committed" never double-counts or drops;
 *   - a base generation carries a `_FOLDED` manifest naming the deltas it
 *     absorbed; [[read]] resolves the current base via an atomically
 *     renamed pointer file and SKIPS manifest-listed deltas, so folded
 *     deltas can be deleted lazily — a crash at any point of [[compact]]
 *     leaves either the old pointer (old base + all deltas: correct) or
 *     the new pointer (new base + only unfolded deltas: correct).
 *
 * At 100 TB the same layout shards by key-hash subdirectory so compaction
 * rewrites only shards with deltas; the monoid-merge logic is unchanged.
 */
object IncrementalView {

  private val PTR = "_CURRENT_BASE"
  private val MANIFEST = "_FOLDED"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmallFile(spark: SparkSession, p: Path): String = {
    val in = fs(spark, p.toString).open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
    finally in.close()
  }

  private def currentBase(spark: SparkSession, storeDir: String): Option[String] = {
    val ptr = new Path(storeDir, PTR)
    if (!fs(spark, storeDir).exists(ptr)) None
    else Some(readSmallFile(spark, ptr))
  }

  /** Delta names already folded into the current base (empty when no base). */
  private def foldedDeltas(spark: SparkSession, storeDir: String): Set[String] =
    currentBase(spark, storeDir).map { b =>
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

  /** Deltas that still count toward the view: COMPLETE on disk (`_SUCCESS`
   * present — a torn delta from a mid-write crash must not be read; the
   * restarted stream rewrites it) and not in the current base's manifest. */
  private def liveDeltas(spark: SparkSession, storeDir: String): Seq[Path] = {
    val f = fs(spark, storeDir)
    val folded = foldedDeltas(spark, storeDir)
    deltaDirs(spark, storeDir)
      .filterNot(p => folded(p.getName))
      .filter(p => f.exists(new Path(p, "_SUCCESS")))
  }

  /** Partial aggregate of one batch: (keys..., n_rows, sum_value). */
  private def partial(batch: DataFrame, keyCols: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col(valueCol)).as("sum_value"))

  /** Merge partials: same schema in, same schema out (monoid fold). */
  private def merge(parts: DataFrame, keyCols: Seq[String]): DataFrame =
    parts.groupBy(keyCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_value")).as("sum_value"))

  /** Apply one micro-batch: append its partial-aggregate delta unless this
   * batchId already has a COMPLETE delta (replay no-op); a torn delta from
   * a mid-write crash is rewritten. Usable standalone for batch-incremental
   * runs.
   *
   * `lineage` scopes the idempotence key: batch ids restart at 0 for every
   * distinct streaming query, so two queries feeding one store would
   * collide on bare ids and silently swallow each other's batches —
   * [[start]] passes a hash of the checkpoint path (stable across restarts
   * of the SAME query, distinct across queries). */
  def applyBatch(batch: DataFrame, batchId: Long, keyCols: Seq[String],
      valueCol: String, storeDir: String, lineage: String = ""): Unit = {
    val spark = batch.sparkSession
    val f = fs(spark, storeDir)
    val tag = if (lineage.isEmpty) "" else s"${lineage}_"
    val delta = new Path(storeDir, f"delta_$tag%s$batchId%020d")
    if (f.exists(delta)) {
      if (f.exists(new Path(delta, "_SUCCESS"))) return // replayed batch
      f.delete(delta, true) // torn write: redo
    }
    partial(batch, keyCols, valueCol).write.mode("errorifexists").parquet(delta.toString)
  }

  /** Current view contents: base generation (if any) merged with all live
   * deltas. */
  def read(spark: SparkSession, storeDir: String, keyCols: Seq[String]): DataFrame = {
    val parts = currentBase(spark, storeDir).map(b =>
      spark.read.parquet(new Path(storeDir, b).toString)).toSeq ++
      liveDeltas(spark, storeDir).map(p => spark.read.parquet(p.toString))
    if (parts.isEmpty)
      throw new IllegalStateException(s"incremental view at $storeDir has no data yet")
    merge(parts.reduce(_ unionByName _), keyCols)
  }

  /**
   * Fold base + live deltas into a new base generation. Step order:
   * (1) write the new base parquet + its `_FOLDED` manifest, (2) atomically
   * repoint `_CURRENT_BASE` (temp file + rename), (3) delete the folded
   * deltas and the old base. A crash before (2) leaves the old pointer —
   * the next read/compact sees old base + all deltas (correct; the orphan
   * new-base dir is garbage-collected at the next compact). A crash after
   * (2) leaves manifest-listed deltas on disk, which read() already skips.
   */
  def compact(spark: SparkSession, storeDir: String, keyCols: Seq[String]): Unit = {
    val f = fs(spark, storeDir)
    val old = currentBase(spark, storeDir)
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
    read(spark, storeDir, keyCols).write.mode("errorifexists").parquet(genPath.toString)
    // CUMULATIVE manifest: carry forward old entries whose delta dirs still
    // linger (a crash between repoint and delete leaves them — a LATER
    // compaction must keep skipping them or read() double-counts once the
    // new manifest replaces the old). Entries whose dirs are gone can drop.
    val lingering = {
      val onDisk = deltaDirs(spark, storeDir).map(_.getName).toSet
      foldedDeltas(spark, storeDir).filter(onDisk)
    }
    val manifest = (lingering ++ folded.map(_.getName)).toSeq.sorted
    val mf = f.create(new Path(genPath, MANIFEST), true)
    try mf.write(manifest.mkString("\n").getBytes("UTF-8")) finally mf.close()
    val tmp = new Path(storeDir, s".$PTR.tmp")
    val out = f.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    // ATOMIC pointer swap: FileContext.rename(OVERWRITE) — a plain
    // delete-then-rename has a window with NO pointer, after which the
    // orphan GC above could eat the only valid base
    org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(storeDir, PTR), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    (folded ++ lingering.map(n => new Path(storeDir, n))).foreach(p => f.delete(p, true))
    old.foreach(o => f.delete(new Path(storeDir, o), true))
  }

  /** Wire into a stream: one delta append per micro-batch, idempotence
   * scoped by the checkpoint identity (see [[applyBatch]]). Compaction is
   * the caller's cadence decision (e.g. every N batches or offline). */
  def start(stream: DataFrame, keyCols: Seq[String], valueCol: String,
      storeDir: String, checkpoint: String): StreamingQuery = {
    val lineage = lineageOf(checkpoint)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatch(batch, id, keyCols, valueCol, storeDir, lineage)
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
 * A micro-batch's delta is written per touched shard (the shard column is
 * one hash expression; untouched shards get nothing). Replay idempotence
 * is inherited per shard: a crash mid-batch leaves complete deltas in some
 * shards — the replay's per-shard existence check skips exactly those.
 */
object ShardedIncrementalView {
  import org.apache.spark.sql.Column

  def shardOf(keyCols: Seq[String], shards: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(shards))

  private def shardDir(storeDir: String, s: Int): String =
    new Path(storeDir, f"shard=$s%05d").toString

  /** Apply one micro-batch across shards (only touched shards write). */
  def applyBatch(batch: DataFrame, batchId: Long, keyCols: Seq[String],
      valueCol: String, storeDir: String, shards: Int, lineage: String = ""): Unit = {
    val tagged = batch.withColumn("__shard", shardOf(keyCols, shards))
    val touched = tagged.select(col("__shard")).distinct()
      .collect().map(_.getLong(0).toInt).sorted
    touched.foreach { s =>
      IncrementalView.applyBatch(tagged.filter(col("__shard") === s).drop("__shard"),
        batchId, keyCols, valueCol, shardDir(storeDir, s), lineage)
    }
  }

  /** Current view: union of the shards that hold data. */
  def read(spark: SparkSession, storeDir: String, keyCols: Seq[String],
      shards: Int): DataFrame = {
    val parts = (0 until shards).flatMap { s =>
      try Some(IncrementalView.read(spark, shardDir(storeDir, s), keyCols))
      catch { case _: IllegalStateException => None } // shard never touched
    }
    if (parts.isEmpty)
      throw new IllegalStateException(s"sharded view at $storeDir has no data yet")
    parts.reduce(_ unionByName _)
  }

  /** Compact ONLY shards with outstanding deltas (each shard's compact()
   * no-ops cheaply otherwise). Returns the shard ids actually folded. */
  def compactTouched(spark: SparkSession, storeDir: String, keyCols: Seq[String],
      shards: Int): Seq[Int] =
    (0 until shards).filter { s =>
      val dir = shardDir(storeDir, s)
      val before = baseGeneration(spark, dir)
      IncrementalView.compact(spark, dir, keyCols)
      baseGeneration(spark, dir) != before
    }

  /** Current base-generation name of a shard (None when never compacted) —
   * a monitoring hook: generation churn per shard is the compaction-cost
   * signal, and tests use it to assert cold shards are never rewritten. */
  def baseGeneration(spark: SparkSession, dir: String): Option[String] = {
    val p = new Path(dir, "_CURRENT_BASE")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }
}
