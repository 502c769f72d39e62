package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Hilbert-curve index of a 2-D point (the classic xy2d walk): like the
 * Morton key, sorting by it co-locates points that are close in BOTH
 * dimensions — but the Hilbert curve has NO diagonal jumps (consecutive
 * indexes are always Manhattan-distance-1 cells), so range-partition
 * boundaries cut fewer clusters and per-file envelopes are equal or
 * tighter than Morton's.
 *
 * A custom expression rather than composed bit ops: the per-level rotation
 * rewrites x and y in terms of BOTH previous values, so a Column-level
 * fold doubles the expression tree per level (2^bits nodes — dead at
 * bits=16), while this is a trivial generated loop. Inputs are masked to
 * the low `bits` bits (same aliasing contract as `Layout.mortonKey`).
 */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && 2 * bits < 63, s"bits=$bits out of range")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val mask = (1L << bits) - 1
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hkX")
      val y = ctx.freshName("hkY")
      val d = ctx.freshName("hkD")
      val s = ctx.freshName("hkS")
      val rx = ctx.freshName("hkRx")
      val ry = ctx.freshName("hkRy")
      val t = ctx.freshName("hkT")
      s"""
         |long $x = $a & ${(1L << bits) - 1}L;
         |long $y = $b & ${(1L << bits) - 1}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
