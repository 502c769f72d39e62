package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable Theta sketches (Apache DataSketches) — the SET-OPERATION member
 * of the persisted-sketch-table family in [[graft.operators.Sketches]].
 * HLL answers "how many distinct"; Theta additionally answers "how many
 * SHARED" (intersection), "how many EXCLUSIVE" (A-not-B), and therefore
 * Jaccard between any two sketched populations — the audience-overlap /
 * split-leakage questions HLL cannot answer without sketching every pair.
 *
 * Same [[TypedImperativeAggregate]] machinery as [[KllExpressions]]: the
 * buffer is the live on-heap Union (which accepts raw updates directly),
 * serialized only at partition boundaries. Unlike KLL, Theta is fully
 * merge-ORDER-invariant (the union keeps hashes below min(theta), a set
 * property), so results are bit-deterministic under any partitioning —
 * and EXACT whenever distinct counts stay under the 2^lgK nominal entries
 * (the standard below-resolution guarantee), which is what lets the
 * overlap query be oracle-checked against exact COUNT(DISTINCT) at test
 * scale while the sampling regime is spec-pinned separately.
 */
object ThetaExpressions {

  /** log2(nominal entries): 12 → 4096 retained hashes ≈ 32 KB max, <2%
   * relative error above resolution (DataSketches default). */
  val defaultLgK: Int = 12

  private def emptyUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  private[functions] trait ThetaAggBase extends TypedImperativeAggregate[Union]
      with UnaryLike[Expression] {
    def lgK: Int
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): Union = emptyUnion(lgK)
    override def merge(b: Union, o: Union): Union = { b.union(o.getResult); b }
    override def eval(b: Union): Any = b.getResult.toByteArray
    override def serialize(b: Union): Array[Byte] = b.getResult.toByteArray
    override def deserialize(bytes: Array[Byte]): Union = {
      val u = emptyUnion(lgK)
      u.union(Sketch.heapify(Memory.wrap(bytes)))
      u
    }
  }

  /** Accumulate BIGINT or STRING keys into a Theta sketch (binary). */
  case class ThetaSketchAgg(child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends ThetaAggBase {
    override def prettyName: String = "theta_sketch_agg"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BIGINT or STRING, got ${other.sql}")
    }
    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null) child.dataType match {
        case LongType => buf.update(v.asInstanceOf[Long])
        // hash the UTF-8 bytes directly — no per-row String allocation
        case _ => buf.update(v.asInstanceOf[UTF8String].getBytes)
      }
      buf
    }
    override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
      copy(child = newChild)
  }

  /** Union already-built Theta sketches (binary → binary) — the rollup side. */
  case class ThetaMergeAgg(child: Expression, lgK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends ThetaAggBase {
    override def prettyName: String = "theta_merge_agg"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY, got ${other.sql}")
    }
    override def update(buf: Union, input: InternalRow): Union = {
      val v = child.eval(input)
      if (v != null) buf.union(Sketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }
    override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): ThetaMergeAgg =
      copy(child = newChild)
  }

  /** Distinct estimate from a serialized sketch. Runs on already-reduced
   * rows (one per group), so CodegenFallback costs nothing measurable. */
  case class ThetaEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "theta_estimate"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY, got ${other.sql}")
    }
    override def nullSafeEval(input: Any): Any =
      Sketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate
    override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
      copy(child = newChild)
  }

  /** Estimate of a set operation over TWO serialized sketches:
   * op ∈ {union, intersect, anotb}. Runs on reduced per-group rows. */
  case class ThetaSetEstimate(left: Expression, right: Expression, op: String,
      lgK: Int = defaultLgK)
      extends BinaryExpression with CodegenFallback {
    require(Set("union", "intersect", "anotb")(op),
      s"theta set op must be union|intersect|anotb, got $op")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = s"theta_${op}_estimate"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (BINARY, BINARY), got (${l.sql}, ${r.sql})")
      }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val sa = Sketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]]))
      val sb = Sketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]]))
      op match {
        case "union" =>
          val u = emptyUnion(lgK); u.union(sa); u.union(sb)
          u.getResult.getEstimate
        case "intersect" =>
          SetOperation.builder().buildIntersection().intersect(sa, sb).getEstimate
        case "anotb" =>
          SetOperation.builder().buildANotB().aNotB(sa, sb).getEstimate
      }
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ThetaSetEstimate =
      copy(left = newLeft, right = newRight)
  }

  // Column-API surface
  def thetaSketchAgg(key: Column, lgK: Int = defaultLgK): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(key), lgK).toAggregateExpression())
  def thetaMergeAgg(sketch: Column, lgK: Int = defaultLgK): Column =
    Bridge.column(ThetaMergeAgg(Bridge.expression(sketch), lgK).toAggregateExpression())
  def thetaEstimate(sketch: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(sketch)))
  def thetaUnionEstimate(a: Column, b: Column, lgK: Int = defaultLgK): Column =
    Bridge.column(ThetaSetEstimate(Bridge.expression(a), Bridge.expression(b), "union", lgK))
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    Bridge.column(ThetaSetEstimate(Bridge.expression(a), Bridge.expression(b), "intersect"))
  def thetaAnotBEstimate(a: Column, b: Column): Column =
    Bridge.column(ThetaSetEstimate(Bridge.expression(a), Bridge.expression(b), "anotb"))
}
