package graft.sinks.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperationBuilder, RowLevelOperationInfo, WriteBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * SQL catalog over `graft-kv` stores — the DDL face of the keyed store.
 * Registered via `spark.sql.catalog.<name> = graft.sinks.v2.GraftKvCatalog`
 * (+ `spark.sql.catalog.<name>.warehouse = <dir>`), it maps identifiers to
 * store directories (`<warehouse>/<namespace…>/<table>`) so the engine's
 * exactly-once kv machinery drives plain SQL:
 *
 *   CREATE TABLE kv.ns.t (k BIGINT, v STRING);
 *   INSERT INTO kv.ns.t SELECT …;          -- two-phase-commit epoch
 *   SELECT * FROM kv.ns.t;                 -- pruned scan, stats reported
 *   SELECT * FROM kv.ns.t VERSION AS OF 1; -- manifest time travel
 *   ALTER TABLE kv.ns.t ADD COLUMN w DOUBLE; -- widening-only evolution
 *
 * Catalog tables expose the committed epoch as a METADATA column (`_epoch`,
 * `SupportsMetadataColumns`): invisible to `SELECT *` and never demanded by
 * INSERT, but selectable by name — the proper Spark shape for system
 * columns, vs. the path-based `spark.read.format("graft-kv")` surface which
 * (compatibly) keeps appending it to the schema.
 */
class GraftKvCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _
  private def conf = KvStore.hadoopConf()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft-kv catalog '$name' needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def nsPath(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(warehouse))(new Path(_, _))

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), ident.name)

  private def isStore(p: Path): Boolean = {
    val fs = p.getFileSystem(conf)
    fs.exists(KvStore.schemaFile(p.toString))
  }

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsPath(namespace)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isStore)
      .map(p => Identifier.of(namespace, p.getName))
  }

  override def loadTable(ident: Identifier): Table = loadAt(ident, None)

  /** `VERSION AS OF <epoch>` — the manifest is the snapshot log, so time
   * travel is just an upper bound on visible epochs. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val epoch = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft-kv: VERSION AS OF takes a committed epoch number, got '$version'")
    }
    loadAt(ident, Some(epoch))
  }

  /** `TIMESTAMP AS OF <t>` — the manifest records each epoch's commit
   * wall-clock, so a timestamp resolves to the NEWEST epoch committed at
   * or before it (micros per the TableCatalog contract). Pre-timestamp
   * manifests carry ts_ms = 0 and so are visible to any positive
   * timestamp — the compatible reading for legacy stores. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = tablePath(ident)
    if (!isStore(path)) throw new NoSuchTableException(ident)
    val tsMs = timestampMicros / 1000L
    val epochs = KvStore.readManifest(conf, path.toString)
    val at = epochs.filter(_.tsMs <= tsMs).map(_.epoch).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft-kv: no epoch committed at or before timestamp ${tsMs} ms" +
          epochs.map(_.tsMs).minOption.fold("")(m => s" — earliest commit is at $m ms")))
    loadAt(ident, Some(at))
  }

  private def loadAt(ident: Identifier, atEpoch: Option[Long]): Table = {
    val path = tablePath(ident)
    if (!isStore(path)) throw new NoSuchTableException(ident)
    // time travel pins the SCHEMA as well as data visibility: a read at an
    // old epoch presents the columns that existed then (ALTER snapshots the
    // pre-widening schema keyed by the last epoch it governed), not
    // post-ALTER columns as nulls
    val schema = atEpoch.fold(KvStore.readSchema(conf, path.toString))(
        e => KvStore.schemaAt(conf, path.toString, e))
      .getOrElse(throw new NoSuchTableException(ident))
    new KvCatalogTable(ident, schema, path.toString, atEpoch)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty, "graft-kv tables are unpartitioned (keys live in rows)")
    KvStore.validateSchema(schema)
    val path = tablePath(ident)
    val fs = path.getFileSystem(conf)
    if (isStore(path)) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(path)
    // nullable-normalized like every schema read (see readSchemaFile):
    // JSON rows can carry null in any column regardless of the DDL
    KvStore.writeAtomic(fs, KvStore.schemaFile(path.toString),
      KvStore.allNullable(schema).json.getBytes("UTF-8"))
    new KvCatalogTable(ident, KvStore.allNullable(schema), path.toString, None)
  }

  /** Widening-only evolution, same contract as the write path: ADD COLUMN
   * appends nullable fields; drops, renames and retypes are refused. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = tablePath(ident)
    val stored = KvStore.readSchema(conf, path.toString)
      .getOrElse(throw new NoSuchTableException(ident))
    val widened = changes.foldLeft(stored) { (s, change) =>
      change match {
        case add: TableChange.AddColumn =>
          require(add.fieldNames.length == 1,
            "graft-kv: nested columns are not supported")
          val name = add.fieldNames.head
          require(!s.fieldNames.contains(name), s"column $name already exists")
          require(KvStore.supportedType(add.dataType), s"unsupported type ${add.dataType}")
          s.add(StructField(name, add.dataType, nullable = true))
        case other => throw new UnsupportedOperationException(
          s"graft-kv: only widening ADD COLUMN is supported, got $other")
      }
    }
    KvStore.validateSchema(widened)
    val fs = path.getFileSystem(conf)
    // snapshot the PRE-alter schema, keyed by the last epoch it governed, so
    // VERSION AS OF <that epoch or older> presents the schema of that time.
    // Skip when nothing is committed (no epoch ever saw the old schema), and
    // never overwrite an existing snapshot for the same epoch — on a double
    // ALTER between commits the FIRST snapshot is the schema those epochs
    // were actually written under.
    KvStore.readManifest(conf, path.toString).map(_.epoch).maxOption.foreach { upto =>
      val snap = KvStore.schemaSnapshotFile(path.toString, upto)
      if (!fs.exists(snap))
        KvStore.writeAtomic(fs, snap, stored.json.getBytes("UTF-8"))
    }
    KvStore.writeAtomic(fs,
      KvStore.schemaFile(path.toString), widened.json.getBytes("UTF-8"))
    new KvCatalogTable(ident, widened, path.toString, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = tablePath(ident)
    if (!isStore(path)) false
    else path.getFileSystem(conf).delete(path, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    if (!isStore(from)) throw new NoSuchTableException(oldIdent)
    val to = tablePath(newIdent)
    val fs = from.getFileSystem(conf)
    if (isStore(to)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(to.getParent)
    require(fs.rename(from, to), s"graft-kv: rename $from -> $to failed")
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).filter(s => s.isDirectory && !isStore(s.getPath))
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Array.empty // single-level namespaces
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace)
    p.getFileSystem(conf).exists(p) && !isStore(p)
  }

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace)) throw new NamespaceAlreadyExistsException(namespace)
    nsPath(namespace).getFileSystem(conf).mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft-kv namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    val fs = p.getFileSystem(conf)
    if (!namespaceExists(namespace)) false
    else {
      if (!cascade && fs.listStatus(p).nonEmpty) {
        // Spark's error class, not a bare IllegalStateException — DROP
        // NAMESPACE on a non-empty namespace is an ANALYSIS error the engine
        // knows how to render, and the details name what blocks the drop.
        val tables = fs.listStatus(p).filter(s => s.isDirectory && isStore(s.getPath))
          .map(_.getPath.getName)
        val details =
          if (tables.nonEmpty) s"contains tables: ${tables.sorted.mkString(", ")}"
          else "contains non-table entries"
        throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
          namespace, details, None)
      }
      fs.delete(p, true)
    }
  }
}

/**
 * A catalog-resolved kv table: clean data schema (INSERT never sees system
 * columns), `_epoch` exposed as a metadata column, scans pruned to exactly
 * the requested fields, writes through the same two-phase-commit epoch
 * machinery as the path-based surface.
 */
class KvCatalogTable(ident: Identifier, storedSchema: StructType, path: String,
    atEpoch: Option[Long])
    extends Table with SupportsRead with SupportsWrite with SupportsMetadataColumns
    with SupportsDelete with SupportsRowLevelOperations {

  /** SQL row-level DML (DELETE with arbitrary predicates, UPDATE, MERGE
   * INTO), delta-based over deletion vectors — see [[KvRowLevelOperation]].
   * Fully-pushable DELETEs still take the metadata/dv fast path below:
   * Spark's OptimizeMetadataOnlyDeleteFromTable converts the rewritten
   * plan back when [[canDeleteWhere]] accepts the filters. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(atEpoch.isEmpty,
      s"graft-kv: row-level ${info.command()} on a time-travel snapshot of " +
        s"$ident is not allowed — DML applies to the current table")
    new RowLevelOperationBuilder {
      override def build(): org.apache.spark.sql.connector.write.RowLevelOperation =
        new KvRowLevelOperation(path, storedSchema, info.command())
    }
  }

  /**
   * Row-level DELETE, two-tier (the Delta/Iceberg shape):
   *  - METADATA tier — a segment DECIDABLE from manifest stats is dropped
   *    whole (fully matching) or kept untouched (provably non-matching),
   *    no data read. The canonical uses: epoch rollback (`DELETE … WHERE
   *    _epoch = 3` — `_epoch` bounds are always exact) and `TRUNCATE
   *    TABLE` (Spark calls deleteWhere(AlwaysTrue)).
   *  - MERGE-ON-READ tier — a PARTIALLY matching segment gets a deletion
   *    vector ([[KvDv]]): a distributed job re-evaluates the pushed
   *    conjunction row-exactly (the reader's own `KvFilters.compile`)
   *    and records matching ordinals in an immutable `_dvs/` side file
   *    the readers skip. No segment rewrite, delete cost ∝ segments
   *    actually overlapping the predicate.
   * Epoch ENTRIES survive with segments removed/vectored: idempotence
   * tags must keep absorbing a replayed micro-batch even after its data
   * was deleted. Any predicate the scan can push (AND-conjunctions of
   * =, <=>, IN, </<=/>/>=, IS [NOT] NULL, incl. `_epoch`) is deletable;
   * OR-trees and expressions stay unsupported (Spark reports DELETE
   * unsupported rather than silently rewriting the table).
   */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    atEpoch.isEmpty && filters.forall(KvFilters.supports(storedSchema, _))

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(canDeleteWhere(filters),
      s"graft-kv: DELETE on ${ident} with unsupported predicate ${filters.mkString(", ")}")
    KvCatalogTable.deleteRows(
      org.apache.spark.sql.SparkSession.active, path, storedSchema, filters,
      ident.toString)
  }

  override def name(): String = ident.toString
  override def schema(): StructType = storedSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ)

  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = KvStore.epochCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "committed epoch that produced the row"
    },
    // the row's physical address — the rowId the SQL row-level operations
    // feed back as deletion-vector tombstones
    new MetadataColumn {
      override def name(): String = KvStore.segCol
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String = "segment file holding the row"
    },
    new MetadataColumn {
      override def name(): String = KvStore.posCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String = "physical line ordinal within _seg"
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
        with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
      private var projection: StructType = storedSchema // no metadata by default
      private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        projection = requiredSchema
      // supported filters (incl. on the _epoch metadata column) are absorbed
      // completely: segment min/max pruning + row-exact reader evaluation,
      // so SELECT … WHERE k = … plans no residual Filter and skips every
      // segment whose recorded key range can't match
      override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        val (ok, residual) = filters.partition(KvFilters.supports(storedSchema, _))
        pushed = ok
        residual
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
      override def build(): Scan =
        new KvScan(path, KvStore.hadoopConf(), atEpoch, Some(projection), pushed.toSeq,
          Option(options.get("maxEpochsPerTrigger")).map(_.toLong))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    KvStore.validateSchema(info.schema())
    new KvWriteBuilder(path, info.schema(), info.queryId(), KvStore.hadoopConf())
  }
}

object KvCatalogTable {

  /** bounded optimistic retries for [[deleteRows]] before surfacing the
   * conflict to the caller */
  private val maxDeleteAttempts = 5

  /** The DELETE conflict re-check, run INSIDE the CAS closure against the
   * manifest current at commit time. Returns the first conflict found:
   *  - a segment NOT in the delete's scanned snapshot whose stats cannot
   *    prove it misses the predicate — rows appended concurrently that the
   *    DELETE never evaluated (Delta's ConcurrentAppendException shape);
   *  - a snapshot segment whose deletion vector changed since the scan —
   *    a concurrent DELETE's union this one would clobber.
   * Either way the commit aborts (manifest unchanged) and the caller
   * re-scans. Exposed for the spec; deleteRows is the only caller. */
  private[v2] def deleteConflict(schema: StructType,
      filters: Array[org.apache.spark.sql.sources.Filter],
      snapshot: Seq[KvStore.Epoch],
      manifest: Seq[KvStore.Epoch]): Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val dvAtSnap: Map[String, Option[String]] =
      snapshot.flatMap(_.segs.map(s => s.name -> s.dv)).toMap
    manifest.iterator.flatMap { e =>
      e.segs.iterator.flatMap { s =>
        dvAtSnap.get(s.name) match {
          case None
            if !KvFilters.pruneSegment(schema, filters.toSeq, e.epoch,
              s.stats.map(mapper.readTree)) =>
            Some(s"concurrently appended segment ${s.name} may match the predicate")
          case Some(dv) if dv != s.dv =>
            Some(s"concurrent DELETE replaced the deletion vector of ${s.name}")
          case _ => None
        }
      }
    }.nextOption()
  }

  /**
   * The two-tier DELETE (see [[KvCatalogTable.deleteWhere]]): classify the
   * snapshot's segments from manifest stats, drop full matches whole, run
   * ONE distributed row-exact pass over the partial ones to build unioned
   * deletion vectors, then CAS-commit both under the conflict re-check —
   * retrying the whole scan on conflict (bounded), so the committed DVs
   * always describe the manifest state they land on. Scales by design:
   * the job touches only segments whose stats overlap the predicate, each
   * task streams one segment once, and the driver handles one (segment →
   * dv-name) pair per partial segment — never row data.
   */
  private[v2] def deleteRows(spark: org.apache.spark.sql.SparkSession,
      path: String, schema: StructType,
      filters: Array[org.apache.spark.sql.sources.Filter],
      label: String): Unit = {
    val conf = KvStore.hadoopConf()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    var attempt = 0
    var lastConflict: Option[String] = None
    while (attempt < maxDeleteAttempts) {
      attempt += 1
      val snapshot = KvStore.readManifest(conf, path)
      // classify every snapshot segment: full match → drop whole;
      // provably no match → untouched; partial → deletion-vector job
      val drops = scala.collection.mutable.HashSet[String]()
      val partials = Seq.newBuilder[(Long, KvStore.Segment)]
      snapshot.foreach { e =>
        e.segs.foreach { s =>
          val st = s.stats.map(mapper.readTree)
          if (KvFilters.segmentFullyMatches(schema, filters.toSeq, e.epoch, st))
            drops += s.name
          else if (!KvFilters.pruneSegment(schema, filters.toSeq, e.epoch, st) &&
              // bloom consult: a point DELETE skips the row-exact job for
              // segments that provably never held the key
              !KvBloom.pruneSegment(conf, path, s.bloom, schema, filters.toSeq))
            partials += ((e.epoch, s))
        }
      }
      val partialSegs = partials.result()
      // one distributed pass: each task streams its segment, re-evaluates
      // the pushed conjunction with the reader's own compiled predicates,
      // and writes the UNION of the old DV and the new matches as a fresh
      // immutable DV file. Already-deleted ordinals skip even the parse.
      val serConf = new org.apache.spark.util.SerializableConfiguration(conf)
      val dvSwaps: Map[String, Option[String]] =
        if (partialSegs.isEmpty) Map.empty
        else {
          val jobs = partialSegs.map { case (ep, s) => (s.name, ep, s.dv) }
          spark.sparkContext
            .parallelize(jobs, math.min(jobs.size,
              math.max(1, spark.sparkContext.defaultParallelism)))
            .map { case (segName, epoch, oldDv) =>
              val segPath = new Path(KvStore.segmentsDir(path), segName)
              val fs = segPath.getFileSystem(serConf.value)
              val compiled = KvFilters.compile(schema, filters.toSeq)
              val old: Array[Long] =
                oldDv.map(KvDv.read(fs, path, _)).getOrElse(Array.emptyLongArray)
              val matched = Array.newBuilder[Long]
              val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
                fs.open(segPath), "UTF-8"))
              try {
                val m = new com.fasterxml.jackson.databind.ObjectMapper
                var ordinal = -1L
                var dvPtr = 0
                var line = reader.readLine()
                while (line != null) {
                  ordinal += 1
                  while (dvPtr < old.length && old(dvPtr) < ordinal) dvPtr += 1
                  if ((dvPtr >= old.length || old(dvPtr) != ordinal) &&
                      KvFilters.matchesNode(compiled, m.readTree(line), epoch))
                    matched += ordinal
                  line = reader.readLine()
                }
              } finally reader.close()
              val hits = matched.result()
              if (hits.isEmpty) (segName, None: Option[String])
              else (segName, Some(KvDv.write(fs, path, old ++ hits)))
            }
            .collect().toMap
        }
      // CAS: apply drops + dv swaps iff no concurrent append/DELETE
      // invalidated the scan; a no-op delete (nothing matched anywhere)
      // leaves the manifest version untouched.
      var conflict: Option[String] = None
      var dropped: Seq[KvStore.Segment] = Nil
      KvStore.mutateManifest(conf, path) { manifest =>
        conflict = deleteConflict(schema, filters, snapshot, manifest)
        if (conflict.isDefined) None
        else {
          val parts = manifest.map { e =>
            val (drop, keep) = e.segs.partition(s => drops.contains(s.name))
            val rewritten = keep.map { s =>
              dvSwaps.getOrElse(s.name, None) match {
                case Some(nv) => s.copy(dv = Some(nv))
                case None => s
              }
            }
            (e.copy(segs = rewritten), drop)
          }
          dropped = parts.flatMap(_._2)
          val changed = dropped.nonEmpty || dvSwaps.values.exists(_.isDefined)
          if (changed) Some(parts.map(_._1)) else None
        }
      }
      if (conflict.isEmpty) {
        // files go AFTER the manifest commit: a crash in between leaves
        // orphans the manifest never lists (harmless), never a manifest
        // pointing at deleted files. A dropped segment's DV goes with it;
        // REPLACED DVs stay for vacuum (a reader inside the grace window
        // may still hold the pre-swap manifest).
        val fs = new Path(path).getFileSystem(conf)
        dropped.foreach(KvStore.deleteSegFiles(fs, path, _))
        return
      }
      lastConflict = conflict
      // retry on a fresh snapshot; this attempt's DV files are
      // unreferenced orphans vacuum sweeps past the grace window
    }
    throw new java.io.IOException(
      s"graft-kv: DELETE on $label kept losing the optimistic-concurrency " +
        s"race after $maxDeleteAttempts attempts (${lastConflict.getOrElse("?")}) — " +
        "the store is unchanged; retry when concurrent writers settle")
  }
}
