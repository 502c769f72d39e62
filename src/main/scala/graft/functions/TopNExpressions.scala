package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Bounded "first N rows per group in a deterministic order" aggregate — the
 * skew-proof primitive behind [[graft.operators.Sampling.capPerKey]] (per-
 * domain/source document caps, the repetition-control step of web-corpus
 * curation).
 *
 * The obvious formulations both melt on a hot key at scale:
 *   - `row_number().over(Window.partitionBy(key))` funnels every row of the
 *     hottest key into ONE window task (windows cannot partial-aggregate) —
 *     the same defect [[graft.operators.Dedup.paragraphDedupGlobal]] had
 *     before round 8;
 *   - `slice(array_sort(collect_list(...)))` partial-aggregates, but the
 *     partial buffer is UNBOUNDED — a map task holding a million rows of one
 *     key collects a million entries before the slice.
 *
 * This aggregate keeps a bounded ordered set (≤ n entries, smallest-n by
 * `(ord, id)`) as its buffer. It partial-aggregates map-side like any
 * declarative aggregate — every map task collapses its local rows of a hot
 * key to ≤ n candidates before the exchange — and the merge of two buffers
 * is again ≤ n, so per-group state is O(n) at every stage regardless of how
 * many rows the key has. Runs as ObjectHashAggregate (the
 * [[TypedImperativeAggregate]] machinery Spark's own collect/percentile
 * aggregates use).
 *
 * Determinism: the order key is caller-supplied (conventionally the hex md5
 * of the row id — the repo's cross-engine hash-order convention, see
 * [[graft.operators.Sampling]]), compared as a plain string with `(ord, id)`
 * tie-breaking, so the kept set is a pure function of the DATA — invariant
 * under partitioning, merge order, and engine.
 */
object TopNExpressions {

  private type Buf = mutable.TreeSet[(String, Long)]

  /**
   * Keep the n smallest `(ord, id)` pairs per group; eval returns the kept
   * ids as ARRAY<BIGINT> in ascending `(ord, id)` order. NULL ord or id
   * contributes nothing (md5 of a non-null key is never null; rows whose id
   * is null cannot be capped deterministically and are dropped).
   */
  case class TopNByOrderAgg(left: Expression, right: Expression, n: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] with BinaryLike[Expression] {
    require(n >= 1, s"n must be >= 1, got $n")

    override def prettyName: String = "top_n_by_order"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (STRING, BIGINT), got (${l.sql}, ${r.sql})")
      }

    override def createAggregationBuffer(): Buf = mutable.TreeSet.empty[(String, Long)]

    private def add(buf: Buf, entry: (String, Long)): Unit = {
      if (buf.size < n) { buf += entry; () }
      else if (Ordering[(String, Long)].lt(entry, buf.last) && !buf.contains(entry)) {
        buf -= buf.last
        buf += entry
      }
    }

    override def update(buf: Buf, input: InternalRow): Buf = {
      val ord = left.eval(input)
      val id = right.eval(input)
      if (ord != null && id != null) {
        add(buf, (ord.toString, id.asInstanceOf[Long]))
      }
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      other.foreach(add(buf, _))
      buf
    }

    override def eval(buf: Buf): Any =
      new GenericArrayData(buf.toArray.map(_._2))

    // length-prefixed UTF-8 bytes, NOT writeUTF: writeUTF throws
    // UTFDataFormatException beyond 65535 bytes, and the public Column API
    // puts no bound on the order key (a caller passing raw document text
    // instead of an md5 hex would fail at the shuffle boundary)
    override def serialize(buf: Buf): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (ord, id) =>
        val b = ord.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeLong(id)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new DataInputStream(new ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      val count = in.readInt()
      var i = 0
      while (i < count) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        buf += ((new String(b, java.nio.charset.StandardCharsets.UTF_8),
          in.readLong()))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): TopNByOrderAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopNByOrderAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TopNByOrderAgg =
      copy(left = newLeft, right = newRight)
  }

  /** ids (BIGINT) of the n smallest `(ord, id)` rows per group, as an array
   * in ascending order. `ord` is a STRING order key (conventionally a hex
   * md5); per-group state is bounded by n at every aggregation stage. */
  def topNByOrder(ord: Column, id: Column, n: Int): Column =
    Bridge.column(
      TopNByOrderAgg(Bridge.expression(ord), Bridge.expression(id), n)
        .toAggregateExpression())
}
