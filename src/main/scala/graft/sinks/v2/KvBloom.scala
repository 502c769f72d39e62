package graft.sinks.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Per-segment key bloom filters — the point-lookup complement to min/max
 * segment pruning (the parquet column-index/bloom split, re-expressed for
 * the store's manifest planning). Min/max prunes RANGES; once a store's
 * segments interleave on a high-cardinality key (every streaming epoch
 * spans the whole key space), every range overlaps every lookup and
 * min/max stops helping. The bloom answers the remaining question —
 * "might THIS value be in THIS segment?" — so `WHERE k = …` scans only
 * the segments that may hold the key.
 *
 * One side file per segment under `_blooms/`, holding a
 * [[BloomFilter]] per long/int/string column, sized from the segment's
 * observed DISTINCT hash count at 1% FPP (a false positive merely scans
 * one extra segment; false negatives are impossible, so pruning is always
 * safe). The manifest's segment entry references the file by name —
 * absence (pre-bloom manifests, capped columns) means "don't know",
 * never prune. Loaded lazily on the DRIVER at planning, only when an
 * equality/IN filter survives min/max pruning, through a small LRU keyed
 * by file name (names are immutable — a fresh segment gets a fresh name).
 */
private[v2] object KvBloom {

  def bloomsDir(path: String) = new Path(path, "_blooms")

  /** side-file format version, written as a leading sentinel (negative —
   * a v1 file starts with a positive nameLen): the query-side hashing is
   * part of the format, so a hash change MUST bump this — a mismatched
   * file deserializes to "no blooms" (never prune) instead of silently
   * false-negating against hashes it never stored */
  private val FormatSentinel: Int = -2

  /** composite 64-bit string identity: murmur32 (ZERO-EXTENDED — `.toLong`
   * would sign-extend negative hashes over the length word and destroy
   * the disambiguation for half of all strings) in the low word, byte
   * length in the high word. Shared verbatim by put and query. */
  private[v2] def stringHash(v: UTF8String): Long =
    (org.apache.spark.unsafe.hash.Murmur3_x86_32
      .hashUnsafeBytes(v.getBaseObject, v.getBaseOffset, v.numBytes(), 42)
      .toLong & 0xFFFFFFFFL) | (v.numBytes().toLong << 32)

  /** columns worth a bloom: equality lookups on these are the use case */
  def bloomable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType => true
    case _ => false
  }

  /** memory guard: past this many rows per column the writer drops the
   * bloom (absent = never prune); 10M longs = 80 MB of hash buffer */
  val maxRowsPerColumn: Int = 10 * 1000 * 1000

  // ---- write side -------------------------------------------------------

  /** Streaming hash accumulator the [[KvDataWriter]] feeds row by row;
   * `serialize` dedups, sizes each filter to the distinct count, and
   * emits the side-file bytes (None = nothing bloomable or all capped). */
  /** minimal growable long buffer (Spark's PrimitiveVector is private) */
  private final class LongBuf {
    var array = new Array[Long](64)
    var size = 0
    def +=(v: Long): Unit = {
      if (size == array.length) array = java.util.Arrays.copyOf(array, array.length * 2)
      array(size) = v; size += 1
    }
  }

  final class Builder(schema: StructType) {
    private val hashes: Array[LongBuf] =
      schema.fields.map(f => if (bloomable(f.dataType)) new LongBuf else null)
    private val capped = new Array[Boolean](schema.length)

    def addLong(i: Int, v: Long): Unit = add(i, v)
    def addString(i: Int, v: UTF8String): Unit =
      // the bloom stores HASHES as longs on both sides (put and query),
      // so string identity is its 64-bit composite hash — collisions only
      // widen the FPP, never break the no-false-negative guarantee
      add(i, KvBloom.stringHash(v))

    private def add(i: Int, h: Long): Unit =
      if (hashes(i) != null && !capped(i)) {
        if (hashes(i).size >= maxRowsPerColumn) capped(i) = true
        else hashes(i) += h
      }

    /** side-file bytes: per-column `(nameLen, nameUtf8, blobLen, blob)`
     * entries, [[BloomFilter]]'s own serialization inside */
    def serialize(): Option[Array[Byte]] = {
      val out = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(out)
      d.writeInt(FormatSentinel)
      var any = false
      var i = 0
      while (i < schema.length) {
        if (hashes(i) != null && !capped(i) && hashes(i).size > 0) {
          val arr = java.util.Arrays.copyOf(hashes(i).array, hashes(i).size)
          java.util.Arrays.sort(arr)
          var distinct = 1
          var j = 1
          while (j < arr.length) { if (arr(j) != arr(j - 1)) distinct += 1; j += 1 }
          val bf = BloomFilter.create(math.max(64L, distinct.toLong), 0.01)
          j = 0
          while (j < arr.length) {
            if (j == 0 || arr(j) != arr(j - 1)) bf.putLong(arr(j))
            j += 1
          }
          val name = schema.fields(i).name.getBytes("UTF-8")
          d.writeInt(name.length); d.write(name)
          val blob = new java.io.ByteArrayOutputStream()
          bf.writeTo(blob)
          d.writeInt(blob.size()); blob.writeTo(d)
          any = true
        }
        i += 1
      }
      d.flush()
      if (any) Some(out.toByteArray) else None
    }
  }

  // ---- read side --------------------------------------------------------

  private def deserialize(bytes: Array[Byte]): Map[String, BloomFilter] = {
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    // unknown/older format (hashing is part of the format): "don't know",
    // never prune — a stale side file must not false-negate
    if (bytes.length < 4 || d.readInt() != FormatSentinel)
      return Map.empty
    val b = Map.newBuilder[String, BloomFilter]
    while (d.available() > 0) {
      val name = new Array[Byte](d.readInt()); d.readFully(name)
      val blob = new Array[Byte](d.readInt()); d.readFully(blob)
      b += new String(name, "UTF-8") ->
        BloomFilter.readFrom(new java.io.ByteArrayInputStream(blob))
    }
    b.result()
  }

  /** Driver-side LRU over loaded side files, keyed by (store, file name) —
   * segment/bloom names are immutable so no invalidation is needed.
   * Bounded by BYTES (file size as the heap proxy — the bit arrays
   * dominate), not entry count: a store of 10M-key segments would
   * otherwise pin multi-GB of driver heap through a count-only cap.
   * Filesystem I/O happens OUTSIDE the lock (planning for concurrent
   * queries must not serialize behind one segment-file read); a racing
   * double-load is idempotent and the second insert just wins. */
  private val cacheMaxBytes = 256L * 1024 * 1024
  private var cacheBytes = 0L
  private val cache =
    new java.util.LinkedHashMap[(String, String), (Map[String, BloomFilter], Long)](
      64, 0.75f, true)

  private def load(conf: Configuration, storePath: String, name: String)
      : Map[String, BloomFilter] = {
    val key = (storePath, name)
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit._1
    }
    val p = new Path(bloomsDir(storePath), name)
    var bytes = 0L
    var failed = false
    val loaded =
      try {
        val fs = p.getFileSystem(conf)
        val len = fs.getFileStatus(p).getLen
        bytes = len
        val buf = new Array[Byte](len.toInt)
        val in = fs.open(p)
        try in.readFully(0, buf) finally in.close()
        deserialize(buf)
      } catch { case _: Exception =>
        // degrade THIS planning pass to no-bloom (pruning stays sound),
        // but do NOT cache the empty map: a transient FS failure cached
        // under the immutable key (bytes=0, so never LRU-evicted) would
        // silently disable bloom pruning for the driver's lifetime — the
        // next pass must retry the read
        failed = true
        Map.empty[String, BloomFilter]
      }
    cache.synchronized {
      if (!failed && !cache.containsKey(key)) {
        cache.put(key, (loaded, bytes))
        cacheBytes += bytes
        val it = cache.entrySet().iterator()
        while (cacheBytes > cacheMaxBytes && it.hasNext) {
          val eldest = it.next()
          if (!(eldest.getKey == key)) { // never evict what we just loaded
            cacheBytes -= eldest.getValue._2
            it.remove()
          }
        }
      }
    }
    loaded
  }

  /** the query-side twin of the Builder's hashing */
  private def hashOf(dt: DataType, v: Any): Option[Long] = (dt, v) match {
    case (LongType | IntegerType, n: java.lang.Number) => Some(n.longValue)
    case (StringType, s: String) => hashOf(dt, UTF8String.fromString(s))
    case (StringType, u: UTF8String) => Some(stringHash(u))
    case _ => None
  }

  /** Conservative bloom pruning: true = the segment PROVABLY contains no
   * row matching some equality/IN conjunct. Anything non-equality,
   * bloom-less, or unhashable keeps the segment. */
  def pruneSegment(conf: Configuration, storePath: String, bloomFile: Option[String],
      schema: StructType, filters: Seq[Filter]): Boolean =
    bloomFile.exists { name =>
      lazy val blooms = load(conf, storePath, name)
      filters.exists { f =>
        val checks: Option[(String, Seq[Any])] = f match {
          case EqualTo(a, v) if v != null => Some((a, Seq(v)))
          case EqualNullSafe(a, v) if v != null => Some((a, Seq(v)))
          case In(a, vs) if vs != null && vs.nonEmpty && vs.forall(_ != null) =>
            Some((a, vs.toSeq))
          case _ => None
        }
        checks.exists { case (a, vs) =>
          (for {
            dt <- schema.fields.find(_.name == a).map(_.dataType)
            bf <- blooms.get(a)
            hs <- Some(vs.flatMap(hashOf(dt, _))) if hs.length == vs.length
          } yield hs.forall(h => !bf.mightContainLong(h))).getOrElse(false)
        }
      }
    }
}
