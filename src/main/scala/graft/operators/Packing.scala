package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training: concatenate documents in a
 * deterministic order and chunk the token stream at a fixed budget
 * (the GPT-style "concatenate-and-chunk" batcher). Each document is
 * mapped to its token offset in the global stream and to the range of
 * fixed-size training sequences it lands in; documents may straddle a
 * sequence boundary (that is the point — zero padding waste).
 *
 * The global running token count is a prefix sum over the whole corpus.
 * A naive `Window.orderBy(id)` with no partition key collapses the
 * corpus into ONE task — fine at test scale, fatal at 100 TB. Instead
 * the classic two-phase distributed scan:
 *
 *   1. bucket rows by id range (bounds from one cheap min/max agg);
 *   2. aggregate per-bucket token totals and turn them into per-bucket
 *      prefix OFFSETS on the driver — bounded metadata, ≤ `nBuckets`
 *      rows, independent of corpus size;
 *   3. running sum WITHIN each bucket (a hash-partitioned window, all
 *      buckets in parallel) plus the bucket's broadcast offset.
 *
 * Deterministic on any partitioning: bucket bounds depend only on the
 * data's id range, the within-bucket order is the unique id.
 */
object Packing {

  /**
   * Assign each row its token offset and sequence range in the packed
   * stream, ordered by ascending `idCol` (must be unique, numeric).
   *
   * Output: idCol, weightCol, `tok_start` (offset of the row's first
   * token), `seq_first`/`seq_last` (first/last budget-sized sequence
   * the row touches), `n_seqs` (sequences straddled). Zero-weight rows
   * occupy no tokens: they report the sequence of their start offset.
   * NULL weights are treated as zero (and reported as 0 in the output).
   */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, nBuckets: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val bounds = df.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (bounds.isNullAt(0)) { // empty input: emit the output schema, no rows
      return df.select(col(idCol), col(weightCol).cast("long").as(weightCol),
        lit(0L).as("tok_start"), lit(0L).as("seq_first"), lit(0L).as("seq_last"),
        lit(0L).as("n_seqs")).limit(0)
    }
    val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
    // Bucket on id >> 1, ALL math integral. Two distinct traps with extreme
    // 64-bit ids: (a) Spark's `/` on longs is DOUBLE division, losing
    // integer precision past 2^53 — ids would misbucket and break the
    // prefix-sum ordering guarantee; (b) `maxId - minId` itself overflows
    // when the id range spans more than 2^63. The halved id is monotonic in
    // the id (so bucket ordering still agrees with id ordering), its range
    // always fits a long, and truncating `div` equals floor because the
    // shifted value is ≥ 0. (expr + backtick-quoting because the Column API
    // has no integral-divide function.)
    val (minH, maxH) = (minId >> 1, maxId >> 1)
    // ceil-div keeps every id in [0, nBuckets); width ≥ 1 avoids div-by-zero
    val width = math.max((maxH - minH) / nBuckets + 1, 1L)
    val quotedId = "`" + idCol.replace("`", "``") + "`"
    val bucket =
      expr(s"(shiftright(CAST($quotedId AS BIGINT), 1) - (${minH}L)) div ${width}L").cast("int")

    // per-bucket totals → exclusive prefix offsets (empty buckets carry the
    // running prefix forward so the array is dense and index-addressable)
    val totals = df.groupBy(bucket.as("b"))
      .agg(sum(coalesce(col(weightCol).cast("long"), lit(0L))).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](nBuckets)
    var acc = 0L
    for (b <- 0 until nBuckets) { offsets(b) = acc; acc += totals.getOrElse(b, 0L) }
    val offsetOf = element_at(array(offsets.map(lit(_)): _*), bucket + 1)

    val w = Window.partitionBy(bucket).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val weight = coalesce(col(weightCol).cast("long"), lit(0L))
    // materialize tok_end in its own projection: derived columns below then
    // reference ONE window expression (and one offset-array lookup) instead
    // of re-evaluating the running sum per output column (Project collapsing
    // stops at the Window node, so without this the physical plan carried
    // seven identical window aggregates)
    val cum = df.select(col(idCol), weight.as(weightCol),
      (offsetOf + sum(weight).over(w)).as("tok_end"))
    val tokStart = col("tok_end") - col(weightCol)
    val seqFirst = floor(tokStart / budget)
    val seqLast = when(col(weightCol) > 0, floor((col("tok_end") - 1) / budget))
      .otherwise(seqFirst)
    cum.select(col(idCol), col(weightCol),
        tokStart.as("tok_start"), seqFirst.as("seq_first"), seqLast.as("seq_last"),
        (seqLast - seqFirst + 1).as("n_seqs"))
  }
}
