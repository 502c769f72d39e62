package graft.sinks.v2

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Filter pushdown for the `graft-kv` scan: the supported subset is absorbed
 * COMPLETELY by the source — segment-level min/max pruning on the driver
 * (skip whole files the manifest proves can't match) plus row-exact
 * evaluation in the reader (so Spark plans NO residual Filter node). The
 * same two-level shape as parquet row-group statistics + predicate
 * evaluation, re-expressed over the store's JSON-lines segments.
 *
 * Supported: =, <=>, IN, <, <=, >, >=, IS NULL, IS NOT NULL on stored
 * long/int/double/boolean/string columns and on the `_epoch` metadata
 * column (whose per-segment "stats" are exact: min = max = the committed
 * epoch). Everything else — OR trees, string prefixes, expressions —
 * returns to Spark as residual.
 *
 * Strings compare as UTF8 bytes ([[UTF8String.compareTo]]) on BOTH the
 * write-side stats fold and the read-side evaluation — matching Spark's
 * string ordering, where Java's String.compareTo (UTF-16 code units)
 * disagrees beyond the BMP.
 */
private[v2] object KvFilters {

  private def dtOf(schema: StructType, a: String): Option[DataType] =
    if (a == KvStore.epochCol) Some(LongType)
    else schema.fields.find(_.name == a).map(_.dataType).filter(KvStore.supportedType)

  /** the single column a simple filter references (supported filters only) */
  private def attrOf(f: Filter): String = f.references.head

  /** filter constant normalized into the column's comparison space:
   * long/int → Long, double → Double, string → UTF8String */
  private def norm(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (LongType | IntegerType, n: java.lang.Number) => Some(n.longValue)
    case (DoubleType, n: java.lang.Number) => Some(n.doubleValue)
    case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue)
    case (StringType, s: String) => Some(UTF8String.fromString(s))
    case (StringType, u: UTF8String) => Some(u)
    case _ => None
  }

  private def cmp(dt: DataType, row: Any, const: Any): Int = dt match {
    case LongType | IntegerType =>
      java.lang.Long.compare(row.asInstanceOf[Long], const.asInstanceOf[Long])
    case DoubleType =>
      java.lang.Double.compare(row.asInstanceOf[Double], const.asInstanceOf[Double])
    case BooleanType =>
      java.lang.Boolean.compare(row.asInstanceOf[Boolean], const.asInstanceOf[Boolean])
    case StringType =>
      row.asInstanceOf[UTF8String].compareTo(const.asInstanceOf[UTF8String])
    case other => throw new IllegalStateException(s"graft-kv filter on $other")
  }

  /** Can the source fully absorb this filter (prune + row-exact eval)? */
  def supports(schema: StructType, f: Filter): Boolean = f match {
    case _: AlwaysTrue => true
    case EqualTo(a, v) => dtOf(schema, a).exists(dt => norm(dt, v).isDefined)
    case EqualNullSafe(a, v) =>
      dtOf(schema, a).exists(dt => v == null || norm(dt, v).isDefined)
    case In(a, vs) =>
      vs != null && dtOf(schema, a).exists(dt => vs.forall(v => norm(dt, v).isDefined))
    case GreaterThan(a, v) => dtOf(schema, a).exists(dt => norm(dt, v).isDefined)
    case GreaterThanOrEqual(a, v) => dtOf(schema, a).exists(dt => norm(dt, v).isDefined)
    case LessThan(a, v) => dtOf(schema, a).exists(dt => norm(dt, v).isDefined)
    case LessThanOrEqual(a, v) => dtOf(schema, a).exists(dt => norm(dt, v).isDefined)
    case IsNull(a) => dtOf(schema, a).isDefined
    case IsNotNull(a) => dtOf(schema, a).isDefined
    case _ => false
  }

  /** a filter compiled for row evaluation: column, its type, a predicate
   * over the row's normalized value (None = null) */
  final case class Compiled(name: String, dt: DataType, pred: Option[Any] => Boolean)

  /** Compile pushed filters (call on the executor: closures stay local). */
  def compile(schema: StructType, fs: Seq[Filter]): Seq[Compiled] = fs.collect {
    case f if !f.isInstanceOf[AlwaysTrue] =>
    val a = attrOf(f)
    val dt = dtOf(schema, a).getOrElse(
      throw new IllegalStateException(s"graft-kv: unpushable filter compiled: $f"))
    def c(v: Any): Any = norm(dt, v).get
    val pred: Option[Any] => Boolean = f match {
      case EqualTo(_, v) =>
        val k = c(v); x => x.exists(cmp(dt, _, k) == 0)
      case EqualNullSafe(_, null) => x => x.isEmpty
      case EqualNullSafe(_, v) =>
        val k = c(v); x => x.exists(cmp(dt, _, k) == 0)
      case In(_, vs) =>
        val ks = vs.map(c); x => x.exists(r => ks.exists(cmp(dt, r, _) == 0))
      case GreaterThan(_, v) =>
        val k = c(v); x => x.exists(cmp(dt, _, k) > 0)
      case GreaterThanOrEqual(_, v) =>
        val k = c(v); x => x.exists(cmp(dt, _, k) >= 0)
      case LessThan(_, v) =>
        val k = c(v); x => x.exists(cmp(dt, _, k) < 0)
      case LessThanOrEqual(_, v) =>
        val k = c(v); x => x.exists(r => cmp(dt, r, k) <= 0)
      case IsNull(_) => x => x.isEmpty
      case IsNotNull(_) => x => x.isDefined
      case other => throw new IllegalStateException(s"graft-kv: unpushable filter compiled: $other")
    }
    Compiled(a, dt, pred)
  }

  /** Row-exact evaluation of the compiled conjunction against a parsed
   * segment line — the ONE definition of match semantics, shared by the
   * scan readers and the DELETE deletion-vector job (`_epoch` comes from
   * the enclosing manifest entry, not the row). */
  def matchesNode(compiled: Seq[Compiled], node: JsonNode, epoch: Long): Boolean =
    compiled.forall { cf =>
      val value: Option[Any] =
        if (cf.name == KvStore.epochCol) Some(epoch)
        else {
          val v = node.get(cf.name)
          if (v == null || v.isNull) None else Some(jsonVal(cf.dt, v))
        }
      cf.pred(value)
    }

  private def jsonVal(dt: DataType, n: JsonNode): Any = dt match {
    case LongType | IntegerType => n.asLong()
    case DoubleType => n.asDouble()
    case BooleanType => n.asBoolean()
    case StringType => UTF8String.fromString(n.asText())
    case other => throw new IllegalStateException(s"graft-kv filter on $other")
  }

  /** per-column segment bounds: (min, max, nulls, rows) — `_epoch` is
   * exact (min = max = the committed epoch); anything else comes from the
   * writer-recorded stats, None = unknown */
  private def bounds(stats: Option[JsonNode], epoch: Long)(a: String, dt: DataType)
      : Option[(Option[Any], Option[Any], Long, Long)] =
    if (a == KvStore.epochCol) Some((Some(epoch), Some(epoch), 0L, 1L))
    else for {
      st <- stats
      rowsN <- Option(st.get("rows"))
      cs <- Option(st.get("cols"))
      cn <- Option(cs.get(a))
    } yield {
      val nulls = Option(cn.get("nulls")).map(_.asLong).getOrElse(0L)
      val min = Option(cn.get("min")).filterNot(_.isNull).map(jsonVal(dt, _))
      val max = Option(cn.get("max")).filterNot(_.isNull).map(jsonVal(dt, _))
      (min, max, nulls, rowsN.asLong)
    }

  /** Conservative segment pruning: true = the segment provably contains NO
   * matching row for the conjunction of pushed filters. Missing stats (a
   * pre-stats manifest, or a column this old segment never saw — schema
   * evolution) mean "don't know" and never prune. */
  def pruneSegment(schema: StructType, filters: Seq[Filter], epoch: Long,
      stats: Option[JsonNode]): Boolean = {
    filters.exists {
      case _: AlwaysTrue => false
      case f =>
      val a = attrOf(f)
      dtOf(schema, a).exists { dt =>
        bounds(stats, epoch)(a, dt).exists { case (min, max, nulls, rows) =>
          val allNull = min.isEmpty && nulls >= rows && rows > 0
          def outside(v: Any): Boolean =
            min.exists(m => cmp(dt, v, m) < 0) || max.exists(m => cmp(dt, v, m) > 0)
          f match {
            case _ if rows == 0 => true // an empty segment matches nothing
            case EqualTo(_, v) => allNull || norm(dt, v).exists(outside)
            case EqualNullSafe(_, null) => nulls == 0
            case EqualNullSafe(_, v) => allNull || norm(dt, v).exists(outside)
            case In(_, vs) => allNull || vs.flatMap(norm(dt, _)).forall(outside)
            case GreaterThan(_, v) =>
              allNull || norm(dt, v).exists(k => max.exists(m => cmp(dt, m, k) <= 0))
            case GreaterThanOrEqual(_, v) =>
              allNull || norm(dt, v).exists(k => max.exists(m => cmp(dt, m, k) < 0))
            case LessThan(_, v) =>
              allNull || norm(dt, v).exists(k => min.exists(m => cmp(dt, m, k) >= 0))
            case LessThanOrEqual(_, v) =>
              allNull || norm(dt, v).exists(k => min.exists(m => cmp(dt, m, k) > 0))
            case IsNull(_) => nulls == 0
            case IsNotNull(_) => allNull
            case _ => false
          }
        }
      }
    }
  }

  /** Metadata-only full-match decision: true = EVERY row of the segment
   * provably satisfies the whole conjunction, so the segment can be
   * deleted (or kept) on manifest stats alone — the Delta/Iceberg-style
   * "metadata delete" test. Conservative: anything undecidable (missing
   * stats, bounds that merely overlap the predicate) is false. An empty
   * filter list means DELETE-all (TRUNCATE): vacuously full-match. */
  def segmentFullyMatches(schema: StructType, filters: Seq[Filter], epoch: Long,
      stats: Option[JsonNode]): Boolean =
    filters.forall {
      case _: AlwaysTrue => true
      case f =>
        val a = attrOf(f)
        dtOf(schema, a).exists { dt =>
          bounds(stats, epoch)(a, dt).exists { case (min, max, nulls, rows) =>
            def minMaxEq(v: Any): Boolean = (min, max) match {
              case (Some(lo), Some(hi)) =>
                cmp(dt, lo, v) == 0 && cmp(dt, hi, v) == 0
              case _ => false
            }
            if (rows == 0) true // empty segment: trivially all-match
            else f match {
              case EqualTo(_, v) => nulls == 0 && norm(dt, v).exists(minMaxEq)
              case EqualNullSafe(_, null) => nulls == rows
              case EqualNullSafe(_, v) => nulls == 0 && norm(dt, v).exists(minMaxEq)
              case In(_, vs) =>
                nulls == 0 && vs.flatMap(norm(dt, _)).exists(minMaxEq) &&
                  min.isDefined && max.isDefined &&
                  cmp(dt, min.get, max.get) == 0
              case GreaterThan(_, v) =>
                nulls == 0 && norm(dt, v).exists(k => min.exists(m => cmp(dt, m, k) > 0))
              case GreaterThanOrEqual(_, v) =>
                nulls == 0 && norm(dt, v).exists(k => min.exists(m => cmp(dt, m, k) >= 0))
              case LessThan(_, v) =>
                nulls == 0 && norm(dt, v).exists(k => max.exists(m => cmp(dt, m, k) < 0))
              case LessThanOrEqual(_, v) =>
                nulls == 0 && norm(dt, v).exists(k => max.exists(m => cmp(dt, m, k) <= 0))
              case IsNull(_) => nulls == rows
              case IsNotNull(_) => nulls == 0
              case _ => false
            }
          }
        }
    }
}
