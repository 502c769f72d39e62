package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fuzzy (approximate string) join with edit distance ≤ 1, scaled by
 * deletion-neighborhood blocking: two strings within Levenshtein distance 1
 * necessarily share a key in {s} ∪ {s with one character deleted} — a
 * substitution at position i makes both deletion-at-i variants equal, an
 * insertion/deletion makes one side's variant equal the other side's full
 * string. So the candidate join is an EQUI-join on the variant key (shuffle
 * ∝ rows × (len+1), never rows²), and exact `levenshtein` (codegen'd
 * built-in) verifies only bucket collisions. This is the FastSS scheme;
 * distance k generalizes to all ≤k-deletion variants (k=1 shipped here —
 * variants grow as len^k, so larger k wants a length cap).
 *
 * 100 TB notes: the variant explosion is map-side (no state), the verify
 * runs on candidate pairs only, and the equi-join is AQE-skew-splittable —
 * pathological keys (e.g. very common short names) can be handled with the
 * same stop-key cap as the shingle joins.
 */
object FuzzyJoin {

  /** (id, key) rows: the string itself + each one-char-deletion variant.
   * Dedup per row (adjacent equal chars produce identical variants). */
  private def deletionKeys(df: DataFrame, idCol: String, strCol: String): DataFrame =
    // spread first: a small parquet input is ONE split, and the variant
    // explosion (rows × len string builds) is the CPU-heavy map stage of
    // this operator — serial on one core it was the single slowest stage of
    // the fuzzy gates (measured 1.2 s of a 2.8 s query at sf0.1)
    TextAnalysis.spreadForCpuWork(df.select(col(idCol).as("id"), col(strCol).as("s")))
      .withColumn("key", explode(array_distinct(concat(
        array(col("s")),
        // variant i = prefix of length i-1 ++ suffix from i+1 (1-based
        // substr); greatest() keeps sequence() ascending for empty strings
        transform(sequence(lit(1), greatest(length(col("s")), lit(1))),
          i => concat(col("s").substr(lit(1), i - 1),
            col("s").substr(i + 1, length(col("s")))))))))

  /**
   * Self-join: pairs of rows whose strings are within Levenshtein
   * distance 1 (excluding self and symmetric duplicates — `id_a < id_b`).
   * Output: (id_a, id_b, s_a, s_b, dist).
   *
   * `maxKeyFreq` is the hot-key cap, mirroring `Dedup.maxDocFreq`: a
   * variant key shared by more than `cap` rows contributes cnt² candidate
   * pairs (a corpus with 10⁶ copies of one short name would emit 10¹²
   * candidates). Dropping such keys bounds the join at the cost of losing
   * pairs whose ONLY shared key is hot — in particular large groups of
   * identical strings stop pairing among themselves. Cap-using callers
   * should therefore not be oracle-compared (the shipped q_fuzzy_join
   * entry runs uncapped).
   */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      maxKeyFreq: Option[Int] = None): DataFrame = {
    // candidate pairs carry bare ids through the join+distinct (pairs from
    // different variant keys dedup BEFORE strings re-attach — the candidate
    // multiset is several× the distinct pair set, so shuffling ids instead
    // of ids+both strings cuts the dominant shuffle's width).
    // The join key is the 64-bit hash of the variant, not the variant
    // string: an 8-byte fixed key makes the candidate join's build map and
    // probes far cheaper than ~len-byte strings, and FastSS recall is
    // untouched — every true pair still shares a real variant (so its hash),
    // and a hash-collision candidate is exactly what the levenshtein verify
    // already rejects.
    val keys0 = deletionKeys(df, idCol, strCol)
      .select(col("id"), xxhash64(col("key")).as("key"))
    val keys = maxKeyFreq match {
      case Some(cap) =>
        val hot = keys0.groupBy(col("key")).agg(count(lit(1)).as("kf"))
          .filter(col("kf") > cap).select(col("key"))
        keys0.join(hot, Seq("key"), "left_anti")
      case None => keys0
    }
    // pin the dedup exchange's width: the candidate multiset is several×
    // the distinct pair set and its shuffle INPUT is only partial-agg'd id
    // pairs, so AQE's input-byte coalescing ran the final dedup + the name
    // re-attach + levenshtein verify + barrier write on a handful of tasks
    // (r19 probe: an 8-task 6.5 s-tasktime stage of q_fuzzy_join_agg). A
    // user repartition on the exact distinct key adds no extra exchange
    // (the groupBy reuses it) and is not coalesced.
    val cand = keys.as("a").join(keys.as("b"), Seq("key"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("id_a"), col("id_b"))
      .distinct()
    val named = df.select(col(idCol).as("id"), col(strCol).as("s"))
    cand
      .join(named.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(named.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1)
  }
}
