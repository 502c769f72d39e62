package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd BPE merge application: fold a word's symbol array through the
 * whole learned merge table in rule order — each rule is the greedy
 * left-to-right fuse of adjacent (left, right) into merged, where a freshly
 * fused symbol re-fuses only if it itself equals the next rule's left
 * (classic non-overlapping BPE, identical to the `aggregate()` fold in
 * [[graft.operators.Tokenize.bpeEncode]]'s previous formulation).
 *
 * Why an expression and not `rules.length` chained `aggregate()` folds:
 * higher-order array functions evaluate INTERPRETED — one boxed lambda call
 * per element per rule, O(rules · word_len) interpreter dispatches per word
 * — and the chained plan tree grows linearly with the merge table, so a
 * vocabulary-scale table (30k merges) blows plan size and analysis time
 * before a single row runs. Here the table rides along as one
 * `UTF8String[][]` reference object, the generated code is two fixed loops
 * (rules × symbols) with double-buffered arrays, and the plan holds ONE
 * node regardless of table size.
 *
 * Binary-equality note: symbols compare with UTF8String.equals (byte
 * equality), matching Spark's string `===` on the same UTF8String values.
 */
case class BpeApplyMerges(child: Expression, rules: Array[Array[String]])
    extends UnaryExpression {

  // propagate element nullability: NULL symbols pass through unchanged
  // (a null never equals a rule's left/right — the same outcome as the
  // fold formulation's three-valued `===` sending them to the append
  // branch), so the output holds nulls exactly when the input can
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def prettyName: String = "bpe_apply_merges"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${t.sql}")
  }

  /** The merge table as UTF8String triples [left, right, merged] — built
   * once per expression instance, shared by eval and (as a reference
   * object) by the generated code. */
  @transient private lazy val utf8Rules: Array[Array[UTF8String]] =
    rules.map(r => r.map(UTF8String.fromString))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) { cur(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    var curLen = n
    var buf = new Array[UTF8String](n)
    var ri = 0
    while (ri < utf8Rules.length) {
      val rule = utf8Rules(ri)
      val l = rule(0); val r = rule(1); val m = rule(2)
      var o = 0
      var j = 0
      while (j < curLen) {
        val x = cur(j)
        if (o > 0 && x != null && buf(o - 1) != null &&
            buf(o - 1) == l && x == r) buf(o - 1) = m
        else { buf(o) = x; o += 1 }
        j += 1
      }
      val tmp = cur; cur = buf; buf = tmp; curLen = o
      ri += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      cur.asInstanceOf[Array[AnyRef]], curLen).asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("bpeRules", utf8Rules,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("bpeN")
      val cur = ctx.freshName("bpeCur")
      val buf = ctx.freshName("bpeBuf")
      val tmp = ctx.freshName("bpeTmp")
      val curLen = ctx.freshName("bpeCurLen")
      val ri = ctx.freshName("bpeRi")
      val rule = ctx.freshName("bpeRule")
      val o = ctx.freshName("bpeO")
      val i = ctx.freshName("bpeI")
      val x = ctx.freshName("bpeX")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $n = $a.numElements();
         |$u[] $cur = new $u[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $cur[$i] = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |}
         |int $curLen = $n;
         |$u[] $buf = new $u[$n];
         |for (int $ri = 0; $ri < $tbl.length; $ri++) {
         |  $u[] $rule = $tbl[$ri];
         |  int $o = 0;
         |  for (int $i = 0; $i < $curLen; $i++) {
         |    $u $x = $cur[$i];
         |    if ($o > 0 && $x != null && $buf[$o - 1] != null
         |        && $buf[$o - 1].equals($rule[0]) && $x.equals($rule[1])) {
         |      $buf[$o - 1] = $rule[2];
         |    } else {
         |      $buf[$o++] = $x;
         |    }
         |  }
         |  $u[] $tmp = $cur; $cur = $buf; $buf = $tmp; $curLen = $o;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($cur, $curLen, Object[].class));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApplyMerges =
    copy(child = newChild)
}

object TokenizeExpressions {
  /** Apply a learned BPE merge table (ordered [left, right, merged] triples)
   * to an ARRAY<STRING> symbol column in one codegen'd pass. */
  def bpeApplyMerges(syms: Column, rules: Array[Array[String]]): Column =
    Bridge.column(BpeApplyMerges(Bridge.expression(syms), rules))
}
