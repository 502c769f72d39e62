package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/**
 * Mergeable quantile sketches (Apache DataSketches KLL, the same library
 * Spark's own `hll_sketch_agg` wraps) — the percentile member of the
 * persisted-sketch-table family in [[graft.operators.Sketches]]. Spark 4
 * ships HLL (distinct) and frequent-items (top-k) aggregates but no
 * quantile sketch, so this is the one member that needs a custom
 * aggregate.
 *
 * Implemented as [[TypedImperativeAggregate]] — the same machinery Spark's
 * sketch aggregates use: the buffer is the LIVE on-heap sketch object,
 * serialized only at partition boundaries (shuffle / final merge), never
 * per row. An `Aggregator`-based formulation would round-trip the sketch
 * through bytes on every update.
 *
 * KLL compaction flips coins, so two different merge ORDERS can give
 * slightly different (both rank-error-bounded) estimates — fine for a
 * persisted sketch table, pinned by tolerance in SketchesSpec rather than
 * by hash equality.
 */
object KllExpressions {

  /** Rank-accuracy/size knob (DataSketches default 200 ≈ 1.65% rank error). */
  val defaultK: Int = 200

  private[functions] trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
      with UnaryLike[Expression] {
    def k: Int
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)
    override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
      b.merge(o); b
    }
    override def eval(b: KllDoublesSketch): Any = b.toByteArray
    override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))
  }

  /** Accumulate DOUBLE values into a KLL sketch (binary). */
  case class KllSketchAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends KllAggBase {
    override def prettyName: String = "kll_sketch_agg"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires DOUBLE, got ${other.sql}")
    }
    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }
    override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
      copy(child = newChild)
  }

  /** Union already-built KLL sketches (binary → binary) — the rollup side. */
  case class KllMergeAgg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends KllAggBase {
    override def prettyName: String = "kll_merge_agg"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY, got ${other.sql}")
    }
    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }
    override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
      copy(child = newChild)
  }

  /** Quantile estimate from a serialized sketch (NULL for empty sketches).
   * Runs on rollup OUTPUT rows (one per group), so CodegenFallback costs
   * nothing measurable. */
  case class KllQuantile(child: Expression, quantile: Double)
      extends UnaryExpression with CodegenFallback {
    require(quantile >= 0.0 && quantile <= 1.0, s"quantile must be in [0,1]: $quantile")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "kll_quantile"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY, got ${other.sql}")
    }
    override def nullSafeEval(input: Any): Any = {
      val s = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      if (s.isEmpty) null else s.getQuantile(quantile)
    }
    override protected def withNewChildInternal(newChild: Expression): KllQuantile =
      copy(child = newChild)
  }

  // Column-API surface
  def kllSketchAgg(value: Column, k: Int = defaultK): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(value), k).toAggregateExpression())
  def kllMergeAgg(sketch: Column, k: Int = defaultK): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(sketch), k).toAggregateExpression())
  def kllQuantile(sketch: Column, q: Double): Column =
    Bridge.column(KllQuantile(Bridge.expression(sketch), q))
}
