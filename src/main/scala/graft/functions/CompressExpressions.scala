package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}

/**
 * Raw-DEFLATE compressed size of a string's UTF-8 bytes (or a binary
 * column), in bytes — the classic compressibility quality signal for text
 * curation: boilerplate/template/generated text compresses far below
 * natural prose, and high-entropy noise barely compresses at all.
 * `deflate_size(text) / octet_length(text)` is the compression-ratio
 * filter of Gopher/MassiveText-style pipelines (Rae et al. 2021, §A.1.2
 * repetition heuristics family).
 *
 * Level is pinned to 6 (zlib default) with `nowrap` raw deflate (no zlib
 * header/checksum), so the byte count is a pure function of the input on a
 * given JDK's zlib. Deterministic per JVM; not oracle-expressible (DuckDB
 * has no deflate surface), so queries built on it are rows-only with
 * spec-pinned invariants. The Deflater is THREAD-LOCALLY reused (reset per
 * row, never re-allocated) — allocation-free on the hot path; per-row cost
 * is the deflate itself, which is the point of the measurement.
 *
 * NULL in → NULL out; empty input → 0 (short-circuited: a finished empty
 * deflate stream would otherwise emit a 2-byte terminal block, which would
 * make the empty document look "incompressible").
 */
case class DeflateSize(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING or BINARY, got ${other.sql}")
    }

  private def isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString)
      DeflateSize.compute(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    else DeflateSize.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      if (isString)
        s"${ev.value} = graft.functions.DeflateSize.compute($a.getBytes());"
      else s"${ev.value} = graft.functions.DeflateSize.compute($a);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  /** One Deflater per executor thread, reset per row — Deflater wraps
   * native zlib state whose allocation dwarfs small-document deflate. */
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(6, /* nowrap = */ true))

  /** Compressed byte count; callable from generated code. */
  def compute(bytes: Array[Byte]): Long = {
    if (bytes.isEmpty) return 0L
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

/**
 * Raw-DEFLATE compressed bytes of a string's UTF-8 bytes (or a binary
 * column) — the materialized twin of [[DeflateSize]] (same level-6 nowrap
 * stream; `octet_length(deflate(x)) == deflate_size(x)` by construction).
 * Useful on its own (compressed payload columns) and as the round-trip
 * witness: `inflate(deflate(x))` must reproduce `x` bit-exactly, which is
 * the one property of the codec an external oracle CAN check (via md5)
 * without having zlib — the `text_compress` gate rides exactly that.
 *
 * NULL in → NULL out; empty input → empty output (mirrors [[DeflateSize]]'s
 * 0-byte convention so the size/bytes pair stays consistent).
 */
case class DeflateBytes(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "deflate"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING or BINARY, got ${other.sql}")
    }

  private def isString = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString)
      DeflateBytes.compute(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    else DeflateBytes.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      if (isString)
        s"${ev.value} = graft.functions.DeflateBytes.compute($a.getBytes());"
      else s"${ev.value} = graft.functions.DeflateBytes.compute($a);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): DeflateBytes =
    copy(child = newChild)
}

object DeflateBytes {

  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(6, /* nowrap = */ true))

  /** Compressed bytes; callable from generated code. */
  def compute(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.isEmpty) return Array.emptyByteArray
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, bytes.length / 3))
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    out.toByteArray
  }
}

/**
 * Inverse of [[DeflateBytes]]: inflate a raw-DEFLATE (nowrap) binary column
 * back to the original bytes. Corrupt/truncated input throws (fail loud —
 * a silent partial inflate would poison downstream dedup/fingerprints).
 * NULL in → NULL out; empty input → empty output.
 */
case class InflateBytes(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "inflate"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    InflateBytes.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.InflateBytes.compute($a);")

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): InflateBytes =
    copy(child = newChild)
}

object InflateBytes {

  private val inflaters: ThreadLocal[java.util.zip.Inflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Inflater(/* nowrap = */ true))

  /** Decompressed bytes; callable from generated code. */
  def compute(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.isEmpty) return Array.emptyByteArray
    val inf = inflaters.get()
    inf.reset()
    inf.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 3))
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n =
        try inf.inflate(buf)
        catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"inflate: corrupt DEFLATE stream (${e.getMessage})", e)
        }
      if (n == 0 && !inf.finished()) {
        throw new IllegalArgumentException(
          "inflate: truncated DEFLATE stream (inflater stalled before finish)")
      }
      out.write(buf, 0, n)
    }
    out.toByteArray
  }
}

object CompressExpressions {

  def deflateSize(data: Column): Column =
    Bridge.column(DeflateSize(Bridge.expression(data)))

  def deflate(data: Column): Column =
    Bridge.column(DeflateBytes(Bridge.expression(data)))

  def inflate(data: Column): Column =
    Bridge.column(InflateBytes(Bridge.expression(data)))
}
