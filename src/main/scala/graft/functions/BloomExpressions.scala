package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Distributed Bloom-filter build + codegen'd membership probe — the scale
 * path of decontamination ([[graft.operators.Dedup.contaminationBloom]]):
 * when the eval-set shingle universe is too large for an exact broadcast
 * hash set, a fixed-size bloom (sized by `expectedItems`/`fpp`, independent
 * of the actual set size) prefilters the corpus map-side; false positives
 * are removed by an exact verify join on the (tiny) surviving fraction.
 *
 * Build side is a [[TypedImperativeAggregate]] over Spark's own
 * `org.apache.spark.util.sketch.BloomFilter` (the sketch Spark's runtime
 * row-group filtering uses): partial filters are built map-side and OR-merged
 * at partition boundaries, so the exchange carries one fixed-size bitset per
 * partition, never the element stream.
 *
 * Probe side holds the DESERIALIZED filter as an expression parameter
 * (shipped to executors once via the codegen references array, like
 * [[VectorExpressions.NearestCentroidIndex]]'s centroid matrix) — the per-row
 * cost is the filter's k hash probes inside whole-stage codegen, no
 * per-batch deserialization, no UDF boundary.
 */
object BloomExpressions {

  /** Accumulate BIGINT values into a bloom filter (binary). All partials
   * must share (expectedItems, fpp) — merge requires identical geometry. */
  case class BloomFilterAgg(child: Expression, expectedItems: Long, fpp: Double,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")

    override def prettyName: String = "bloom_filter_build_agg"
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BIGINT, got ${other.sql}")
    }

    override def createAggregationBuffer(): BloomFilter =
      BloomFilter.create(expectedItems, fpp)

    override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
      val v = child.eval(input)
      if (v != null) buf.putLong(v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter =
      buf.mergeInPlace(other)

    override def eval(buf: BloomFilter): Any = serialize(buf)

    override def serialize(buf: BloomFilter): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      buf.writeTo(bos)
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): BloomFilter =
      BloomFilter.readFrom(new ByteArrayInputStream(bytes))

    override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
      copy(child = newChild)
  }

  /** Membership probe of a BIGINT against a driver-held filter: false means
   * definitely absent, true means present-or-false-positive. Codegen'd — the
   * filter rides the references array, the probe stays in the fused loop. */
  case class BloomMightContainLong(child: Expression, filter: BloomFilter)
      extends UnaryExpression {
    override def prettyName: String = "bloom_might_contain_long"
    override def dataType: DataType = BooleanType

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BIGINT, got ${other.sql}")
    }

    override def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val f = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      defineCodeGen(ctx, ev, c => s"$f.mightContainLong($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
      copy(child = newChild)
  }

  // Column-API surface
  def bloomFilterAgg(value: Column, expectedItems: Long, fpp: Double): Column =
    Bridge.column(
      BloomFilterAgg(Bridge.expression(value), expectedItems, fpp).toAggregateExpression())
  def mightContainLong(value: Column, filter: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(value), filter))

  /** Deserialize a collected filter (the driver-side half of build→probe). */
  def filterFromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
}
