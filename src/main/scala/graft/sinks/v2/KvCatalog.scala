package graft.sinks.v2

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
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
    KvStore.writeAtomic(fs, KvStore.schemaFile(path.toString),
      schema.json.getBytes("UTF-8"))
    new KvCatalogTable(ident, schema, path.toString, None)
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
    with SupportsDelete {

  /**
   * METADATA-ONLY delete (the Delta/Iceberg "metadata delete" shape):
   * `DELETE FROM kv.ns.t WHERE …` succeeds only when every visible segment
   * is DECIDABLE from manifest stats — fully matching (dropped whole) or
   * provably non-matching (kept untouched). Partial overlaps refuse, so a
   * delete never rewrites data files. The canonical use is epoch rollback
   * — `DELETE … WHERE _epoch = 3` yanks one poisoned micro-batch, since
   * `_epoch` bounds are always exact — and `TRUNCATE TABLE` (Spark calls
   * deleteWhere(AlwaysTrue)). Epoch ENTRIES survive with their segments
   * removed: the idempotence tags must keep absorbing a replayed
   * micro-batch even after its data was rolled back. Same single-writer
   * contract as writes/compaction.
   */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean = {
    val conf = KvStore.hadoopConf()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    atEpoch.isEmpty &&
      filters.forall(KvFilters.supports(storedSchema, _)) &&
      KvStore.readManifest(conf, path).forall(e => e.segs.forall { s =>
        val st = s.stats.map(mapper.readTree)
        KvFilters.segmentFullyMatches(storedSchema, filters.toSeq, e.epoch, st) ||
          KvFilters.pruneSegment(storedSchema, filters.toSeq, e.epoch, st)
      })
  }

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(canDeleteWhere(filters),
      s"graft-kv: DELETE on ${ident} is not metadata-only for ${filters.mkString(", ")} — " +
        "a segment partially matches; rewrite via INSERT OVERWRITE instead")
    val conf = KvStore.hadoopConf()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    // the partition re-evaluates against the CURRENT manifest on every CAS
    // attempt, so a concurrent append during the delete is never dropped —
    // only segments that fully match the predicate at commit time go.
    // Decidability is ALSO re-verified inside the closure: canDeleteWhere
    // ran before the CAS, and a segment appended concurrently may only
    // PARTIALLY match the predicate — committing then would report the
    // DELETE successful while leaving matching rows behind. Mirror
    // compact's conflict detection: leave the manifest unchanged and
    // abort with the metadata-only error.
    var dropped: Seq[KvStore.Segment] = Nil
    var undecidable = false
    KvStore.mutateManifest(conf, path) { manifest =>
      undecidable = KvCatalogTable.hasUndecidableSegment(storedSchema, filters, manifest)
      if (undecidable) None
      else {
        val parts = manifest.map { e =>
          val (drop, keep) = e.segs.partition(s =>
            KvFilters.segmentFullyMatches(storedSchema, filters.toSeq, e.epoch,
              s.stats.map(mapper.readTree)))
          (e.copy(segs = keep), drop)
        }
        dropped = parts.flatMap(_._2)
        Some(parts.map(_._1))
      }
    }
    if (undecidable)
      throw new IllegalArgumentException(
        s"graft-kv: DELETE on ${ident} lost an optimistic-concurrency race — " +
          "a concurrently appended segment partially matches " +
          s"${filters.mkString(", ")}, so the delete is no longer metadata-only; " +
          "the store is unchanged; retry or rewrite via INSERT OVERWRITE")
    // files go AFTER the manifest commit: a crash in between leaves
    // orphans the manifest never lists (harmless), never a manifest
    // pointing at deleted files
    val fs = new Path(path).getFileSystem(conf)
    dropped.foreach(s =>
      try fs.delete(new Path(KvStore.segmentsDir(path), s.name), false)
      catch { case _: Exception => () })
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
  /** The deleteWhere decidability re-check, run INSIDE the CAS closure:
   * true when any visible segment neither fully matches nor provably
   * excludes the predicate — i.e. a concurrent append made the DELETE no
   * longer metadata-only and the commit must abort (compact's conflict
   * shape). Exposed for the spec; deleteWhere is the only caller. */
  private[v2] def hasUndecidableSegment(schema: StructType,
      filters: Array[org.apache.spark.sql.sources.Filter],
      manifest: Seq[KvStore.Epoch]): Boolean = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    manifest.exists(e => e.segs.exists { s =>
      val st = s.stats.map(mapper.readTree)
      !KvFilters.segmentFullyMatches(schema, filters.toSeq, e.epoch, st) &&
        !KvFilters.pruneSegment(schema, filters.toSeq, e.epoch, st)
    })
  }
}
