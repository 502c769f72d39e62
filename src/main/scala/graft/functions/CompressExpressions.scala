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

object CompressExpressions {

  def deflateSize(data: Column): Column =
    Bridge.column(DeflateSize(Bridge.expression(data)))
}
