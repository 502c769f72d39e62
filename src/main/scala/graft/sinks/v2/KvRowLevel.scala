package graft.sinks.v2

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/**
 * SQL row-level DML for graft-kv — `DELETE`/`UPDATE`/`MERGE INTO` planned
 * by Spark's row-level-operation rewrites, executed DELTA-based
 * (merge-on-read): the operation's scan surfaces each row's physical
 * address as the `(_seg, _pos)` rowId (segment file name + line ordinal —
 * exactly what deletion vectors index), executors return tombstones and
 * staged insert segments, and the driver commits dv swaps plus one new
 * epoch in a single manifest CAS. Spark keeps routing fully-pushable
 * DELETE predicates to the metadata/dv path ([[KvCatalogTable.deleteWhere]]
 * via `OptimizeMetadataOnlyDeleteFromTable`); this operation is what makes
 * the rest of SQL DML — arbitrary predicates, subqueries, UPDATE's SET,
 * MERGE's matched/not-matched actions — work at all.
 *
 * Snapshot isolation: the manifest is pinned ONCE when the operation is
 * built; the scan reads exactly that snapshot and the commit CAS re-checks
 * the live manifest against it, aborting (store unchanged, named error,
 * statement-level retry) if ANY concurrent commit landed — the
 * serializable choice, mirroring Delta's ConcurrentAppend behavior, since
 * an arbitrary rewrite condition can't be re-validated against rows the
 * scan never saw.
 *
 * Scale shape: tombstones travel as (segment → ordinal array) per task —
 * bounded by rows actually deleted, never scanned rows; inserts ride the
 * normal task-staged segment writer (stats + blooms included). UPDATEs are
 * split delete+insert ([[representUpdateAsDeleteAndInsert]]), so the
 * updated row's NEW version lives in the new epoch like any upsert.
 */
class KvRowLevelOperation(path: String, storedSchema: StructType,
    cmd: RowLevelOperation.Command) extends SupportsDelta {

  private val conf: Configuration = KvStore.hadoopConf()
  /** the pinned snapshot: scanned by the read side, re-checked by the CAS */
  private[v2] val snapshot: Seq[KvStore.Epoch] = KvStore.readManifest(conf, path)

  override def command(): RowLevelOperation.Command = cmd

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(KvStore.segCol), Expressions.column(KvStore.posCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def description(): String = s"graft-kv row-level $cmd path=$path"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
        with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
      private var projection: StructType = storedSchema
      private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        projection = requiredSchema
      override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
          : Array[org.apache.spark.sql.sources.Filter] = {
        val (ok, residual) = filters.partition(KvFilters.supports(storedSchema, _))
        pushed = ok
        residual
      }
      override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
      override def build(): Scan =
        new KvScan(path, conf, None, Some(projection), pushed.toSeq,
          pinnedManifest = Some(snapshot))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def description(): String =
          s"graft-kv row-level $cmd path=$path"
        override def toBatch: DeltaBatchWrite =
          new KvDeltaBatchWrite(path, storedSchema, info.schema(),
            info.rowIdSchema().orElse(null), snapshot, conf)
      }
    }
}

/** executor → driver unit: optional staged insert segment + per-segment
 * tombstone ordinals (bounded by DELETED rows, never scanned rows) */
case class KvDeltaCommitMessage(insert: Option[KvCommitMessage],
    deletes: Map[String, Array[Long]]) extends WriterCommitMessage

class KvDeltaBatchWrite(path: String, storedSchema: StructType,
    rowSchema: StructType, rowIdSchema: StructType,
    snapshot: Seq[KvStore.Epoch], conf: Configuration) extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    // locate (_seg, _pos) inside whatever rowId projection Spark built —
    // positional assumptions would silently mis-address tombstones
    val idSchema = Option(rowIdSchema).getOrElse(StructType(Nil))
    val segIdx = idSchema.fieldNames.indexOf(KvStore.segCol)
    val posIdx = idSchema.fieldNames.indexOf(KvStore.posCol)
    require(segIdx >= 0 && posIdx >= 0,
      s"graft-kv: rowId projection ${idSchema.simpleString} lacks " +
        s"${KvStore.segCol}/${KvStore.posCol}")
    new KvDeltaWriterFactory(path, rowSchema,
      new SerializableConfiguration(conf), segIdx, posIdx)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: KvDeltaCommitMessage => m }
    val staged = msgs.flatMap(_.insert).map(m =>
      KvStore.StagedSeg(m.stagedFile, m.statsJson, m.bloomFile)).toSeq
    // union tombstones across tasks (a shuffle upstream of the write can
    // scatter one segment's deletes over many tasks)
    val tombstones: Map[String, Array[Long]] = msgs.flatMap(_.deletes)
      .groupBy(_._1).map { case (seg, parts) => seg -> parts.flatMap(_._2) }
    KvStore.commitRowLevel(conf, path, storedSchema, snapshot, staged, tombstones)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // same staged shape as any kv write: reuse the one cleanup path
    KvWrite.cleanStaged(conf, messages
      .collect { case m: KvDeltaCommitMessage => m }
      .flatMap(_.insert.toSeq).toArray[WriterCommitMessage])
}

/** standalone (serializable) factory — an inner class would drag the
 * non-serializable batch write into every task closure */
class KvDeltaWriterFactory(path: String, rowSchema: StructType,
    conf: SerializableConfiguration, segIdx: Int, posIdx: Int)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new KvDeltaWriter(path, rowSchema, conf, segIdx, posIdx,
      s"rowlevel-$partitionId-$taskId")
}

/** Per-task delta writer: tombstones accumulate in memory keyed by segment;
 * inserts ride a lazily-created [[KvDataWriter]] (stats + blooms as any
 * other write). UPDATE arrives pre-split (delete + insert). */
class KvDeltaWriter(path: String, rowSchema: StructType,
    conf: SerializableConfiguration, segIdx: Int, posIdx: Int, label: String)
    extends DeltaWriter[InternalRow] {

  private val deletes =
    scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.ArrayBuffer[Long]]
  private var inserter: KvDataWriter = null

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val seg = id.getUTF8String(segIdx).toString
    deletes.getOrElseUpdate(seg,
      new scala.collection.mutable.ArrayBuffer[Long]) += id.getLong(posIdx)
  }

  override def insert(row: InternalRow): Unit = {
    if (inserter == null)
      inserter = new KvDataWriter(path, rowSchema, conf.value, label)
    inserter.write(row)
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id); insert(row)
  }

  override def commit(): WriterCommitMessage = {
    val ins =
      if (inserter == null) None
      else Some(inserter.commit().asInstanceOf[KvCommitMessage])
    KvDeltaCommitMessage(ins, deletes.map { case (k, v) => (k, v.toArray) }.toMap)
  }

  override def abort(): Unit = if (inserter != null) inserter.abort()
  override def close(): Unit = ()
}
