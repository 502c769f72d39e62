package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{col, row_number}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * Whole-operator custom plan (extension ladder rung (c), SURVEY.md §7c /
 * spark_guide): cosine top-k join as a LogicalPlan + Strategy + SparkPlan.
 *
 * Semantics: for every query row (id, vec) emit its k best corpus rows by
 * cosine similarity. The built-in composition (broadcast nested-loop join →
 * Window rank) must GENERATE queries×corpus scored rows before
 * `WindowGroupLimit` trims them; this operator never materializes them —
 * each corpus partition keeps one bounded k-heap per query and emits
 * exactly queries×k rows per partition, which a tiny final rank pass merges.
 * At 100 TB the difference is the shuffle: |queries|·k·partitions rows vs
 * |queries|·|corpus| on the unfused plan.
 *
 * Registered via `spark.experimental.extraStrategies` (public API, no
 * session rebuild needed); [[CosineTopK.topK]] is the user surface.
 */
final case class CosineTopKPartial(
    corpus: LogicalPlan, queries: LogicalPlan, k: Int,
    output: Seq[Attribute])
  extends BinaryNode {

  override def left: LogicalPlan = corpus
  override def right: LogicalPlan = queries

  /** We consume every child column — without this, ColumnPruning sees an
   * expression-less node with empty references and projects the children
   * down to nothing (positional reads then hit garbage offsets). */
  override def references: AttributeSet = AttributeSet(children.flatMap(_.output))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): CosineTopKPartial =
    copy(corpus = newLeft, queries = newRight)
}

object CosineTopKPartial {
  /** Output attributes are minted ONCE here — `output` as a member val would
   * regenerate expr-IDs on every `copy()` and break downstream binding. */
  def apply(corpus: LogicalPlan, queries: LogicalPlan, k: Int): CosineTopKPartial =
    CosineTopKPartial(corpus, queries, k, Seq(
      AttributeReference("query_id", LongType, nullable = false)(),
      AttributeReference("neighbor_id", LongType, nullable = false)(),
      AttributeReference("cos", DoubleType, nullable = false)()))
}

final case class CosineTopKPartialExec(
    corpus: SparkPlan, queries: SparkPlan, k: Int,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def left: SparkPlan = corpus
  override def right: SparkPlan = queries

  /** Corpus stays wherever it is; the (small) query side is broadcast. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  /** These attributes originate HERE (not from children) — without this the
   * plan printer flags the node with `!` as having missing inputs. */
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val broadcastQueries = queries.executeBroadcast[Array[InternalRow]]()
    corpus.execute().mapPartitions { corpusRows =>
      // decode the broadcast queries once per partition; null-vec/null-id
      // query rows are skipped (the built-in composition degrades the same
      // way: a null embedding can never enter anyone's top-k)
      val qs = broadcastQueries.value
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .map { r =>
          val id = r.getLong(0)
          val vec = r.getArray(1).toFloatArray()
          var n = 0.0; var i = 0
          while (i < vec.length) { n += vec(i).toDouble * vec(i).toDouble; i += 1 }
          (id, vec, math.sqrt(n))
        }
      // min-ordered bounded heap per query: worst survivor at the head.
      // (cos asc, id desc) — so the comparator is allocation-free and the
      // head is the first element to displace
      val heapOrdering = new java.util.Comparator[(Double, Long)] {
        override def compare(a: (Double, Long), b: (Double, Long)): Int = {
          val c = java.lang.Double.compare(a._1, b._1)
          if (c != 0) c else java.lang.Long.compare(b._2, a._2)
        }
      }
      val heaps = qs.map(_ => new java.util.PriorityQueue[(Double, Long)](
        kLocal + 1, heapOrdering))

      corpusRows.foreach { row =>
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val cid = row.getLong(0)
          val cvec = row.getArray(1).toFloatArray()
          var cn = 0.0; var i = 0
          while (i < cvec.length) { cn += cvec(i).toDouble * cvec(i).toDouble; i += 1 }
          val cnorm = math.sqrt(cn)
          var q = 0
          while (q < qs.length) {
            val (qid, qvec, qnorm) = qs(q)
            if (qid != cid) {
              var dot = 0.0; var j = 0
              val len = math.min(qvec.length, cvec.length)
              while (j < len) { dot += qvec(j).toDouble * cvec(j).toDouble; j += 1 }
              val raw = dot / (qnorm * cnorm)
              // NaN (zero-norm side) must LOSE, not win: demote to -∞ so a
              // degenerate vector never displaces a real neighbor — the same
              // rule as Similarity.cosRankKey in the built-in composition
              // (raw cos never surfaces: topK outputs ranks only)
              val cos = if (java.lang.Double.isNaN(raw)) Double.NegativeInfinity else raw
              val heap = heaps(q)
              if (heap.size < kLocal) heap.add((cos, cid))
              else {
                // displace iff (cos, cid) ranks strictly better than the head
                val head = heap.peek()
                val c = java.lang.Double.compare(cos, head._1)
                if (c > 0 || (c == 0 && cid < head._2)) {
                  heap.poll(); heap.add((cos, cid))
                }
              }
            }
            q += 1
          }
        }
      }

      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val out = Seq.newBuilder[InternalRow]
      var q = 0
      while (q < qs.length) {
        heaps(q).iterator().forEachRemaining { case (cos, cid) =>
          out += proj(InternalRow(qs(q)._1, cid, cos)).copy()
        }
        q += 1
      }
      out.result().iterator
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): CosineTopKPartialExec =
    copy(corpus = newLeft, queries = newRight)
}

object CosineTopKStrategy extends SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CosineTopKPartial(corpus, queries, k, _) =>
      CosineTopKPartialExec(planLater(corpus), planLater(queries), k,
        plan.output) :: Nil
    case _ => Nil
  }
}

object CosineTopK {

  /** Install the strategy once per session (public extraStrategies hook). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(CosineTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ CosineTopKStrategy
    }

  /**
   * Top-k cosine neighbors per query row via the custom operator. Inputs
   * must expose `(idCol: LONG, vecCol: ARRAY<FLOAT>)`. The partial exec
   * emits k rows per query per corpus partition; the final rank is a
   * window over that tiny set.
   */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    ensureRegistered(spark)
    def shaped(df: DataFrame) =
      df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val partial = Bridge.ofRows(spark, CosineTopKPartial(
      Bridge.planOf(shaped(corpus)), Bridge.planOf(shaped(queries)), k))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))  // partial emits -∞ for NaN
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
