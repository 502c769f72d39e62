package graft.sinks.v2

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Deletion vectors for `graft-kv` — the merge-on-read half of row-level
 * DELETE (the Delta/Iceberg deletion-vector shape, re-expressed over the
 * store's JSON-lines segments, where a row's stable address is its line
 * ordinal within its immutable segment file).
 *
 * A DV is an immutable side file under `_dvs/` holding the SORTED set of
 * deleted row ordinals for exactly one segment. The manifest's segment
 * entry references the current DV by name; a later DELETE writes a NEW
 * file holding the union and swaps the reference in the same CAS commit
 * that every manifest change rides — DV files themselves are never
 * rewritten, so a reader holding an older manifest keeps a consistent
 * view. Unreferenced DV files (replaced unions, folded segments) are
 * vacuum's job.
 *
 * Encoding: unsigned LEB128 varints — a count, the first ordinal, then
 * gaps between consecutive ordinals. Deletes cluster (a predicate tends
 * to match runs of adjacent rows), so gap-varints stay 1–2 bytes each:
 * ~1 MB per million deleted rows against ~8 MB for raw longs, and
 * decoding is a single sequential pass with no allocation beyond the
 * output array.
 */
private[v2] object KvDv {

  def dvsDir(path: String) = new Path(path, "_dvs")

  /** varint-encode sorted-distinct ordinals (count, first, gaps…) */
  def encode(sortedDistinct: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(sortedDistinct.length * 2 + 8)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    varint(sortedDistinct.length.toLong)
    var prev = 0L
    var i = 0
    while (i < sortedDistinct.length) {
      val o = sortedDistinct(i)
      varint(if (i == 0) o else o - prev)
      prev = o
      i += 1
    }
    out.toByteArray
  }

  /** inverse of [[encode]]: the sorted deleted-ordinal array */
  def decode(bytes: Array[Byte]): Array[Long] = {
    var pos = 0
    def varint(): Long = {
      var v = 0L; var shift = 0
      var b = bytes(pos); pos += 1
      while ((b & 0x80) != 0) {
        v |= (b & 0x7fL) << shift; shift += 7
        b = bytes(pos); pos += 1
      }
      v | ((b & 0x7fL) << shift)
    }
    val n = varint().toInt
    val out = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      prev = if (i == 0) varint() else prev + varint()
      out(i) = prev
      i += 1
    }
    out
  }

  /** Write ordinals (any order, duplicates fine) as a fresh immutable DV
   * file under `_dvs/`; returns the file NAME the manifest references. */
  def write(fs: FileSystem, storePath: String, ordinals: Array[Long]): String = {
    val sorted = ordinals.distinct.sorted
    val name = s"dv-${UUID.randomUUID()}.bin"
    fs.mkdirs(dvsDir(storePath))
    KvStore.writeAtomic(fs, new Path(dvsDir(storePath), name), encode(sorted))
    name
  }

  /** Read a DV by manifest name: the sorted deleted-ordinal array. */
  def read(fs: FileSystem, storePath: String, name: String): Array[Long] =
    readFile(fs, new Path(dvsDir(storePath), name))

  /** Read a DV by full path (the shape reader partitions carry). */
  def readFile(fs: FileSystem, p: Path): Array[Long] = {
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      decode(buf)
    } finally in.close()
  }
}
