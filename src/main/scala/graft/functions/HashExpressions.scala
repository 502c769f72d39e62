package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static mix used by the minhash family; callable from generated code. */
object HashMix {
  /** splitmix64 finalizer (public-domain constant mix). */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** seed for the j-th minhash function (golden-ratio multiples). */
  def seed(j: Int): Long = 0x9e3779b97f4a7c15L * (j + 1)
}

/**
 * 64-bit SimHash from an array of element hashes, in ONE codegen'd pass
 * (the higher-order-function formulation runs 64 interpreted folds over the
 * array — measured ~11 s on 500 docs; this is milliseconds).
 */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |int[] votes = new int[64];
         |for (int i = 0; i < $a.numElements(); i++) {
         |  long h = $a.getLong(i);
         |  for (int b = 0; b < 64; b++) {
         |    if (((h >>> b) & 1L) == 1L) votes[b]++; else votes[b]--;
         |  }
         |}
         |long out = 0L;
         |for (int b = 0; b < 64; b++) if (votes[b] > 0) out |= (1L << b);
         |${ev.value} = out;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * MinHash signature from an array of element hashes: sig[j] =
 * min over elements of splitmix64(h ⊕ seedⱼ), j < k — the standard
 * one-hash + k-mix construction, one codegen'd pass over the array
 * instead of k interpreted folds.
 */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = HashMix.mix64(h ^ HashMix.seed(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |long[] sig = new long[$k];
         |java.util.Arrays.fill(sig, Long.MAX_VALUE);
         |for (int i = 0; i < $a.numElements(); i++) {
         |  long h = $a.getLong(i);
         |  for (int j = 0; j < $k; j++) {
         |    long v = graft.functions.HashMix.mix64(h ^ graft.functions.HashMix.seed(j));
         |    if (v < sig[j]) sig[j] = v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(sig);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object HashExpressions {
  def simhash64(hashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(hashes)))
  def minhashSig(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashes), k))
}
