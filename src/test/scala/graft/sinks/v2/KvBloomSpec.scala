package graft.sinks.v2

import java.nio.file.Files

import org.apache.spark.sql.sources.{EqualTo, In}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Per-segment bloom pruning: min/max prunes ranges, but an interleaved
 * high-cardinality key space (every streaming epoch spans all keys) makes
 * every range overlap every point lookup — the bloom is what keeps
 * `WHERE k = …` from scanning every epoch of a long-lived store.
 * In-package to drive `KvScan.planInputPartitions` deterministically.
 */
class KvBloomSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def tmp(): String =
    Files.createTempDirectory("graft_kvbloom_").toString + "/store"

  private def conf = spark.sessionState.newHadoopConf()

  private def partitions(p: String, fs: org.apache.spark.sql.sources.Filter*): Int =
    new KvScan(p, conf, filters = fs.toSeq).toBatch.planInputPartitions().length

  test("interleaved key ranges: point lookups scan only bloom-positive segments") {
    val p = tmp()
    // two epochs whose key RANGES fully overlap ([0,18] vs [1,19]) but
    // whose key SETS are disjoint (evens vs odds) — min/max cannot prune
    spark.range(0, 10).selectExpr("id * 2 as k", "concat('even', id) as v")
      .coalesce(1).write.format("graft-kv").option("path", p).mode("append").save()
    spark.range(0, 10).selectExpr("id * 2 + 1 as k", "concat('odd', id) as v")
      .coalesce(1).write.format("graft-kv").option("path", p).mode("append").save()
    val manifest = KvStore.readManifest(conf, p)
    assert(manifest.flatMap(_.segs).forall(_.bloom.isDefined),
      "writer records a bloom side file per segment")
    assert(partitions(p) === 2)
    // stats alone keep both segments; the bloom prunes the odd one
    assert(partitions(p, EqualTo("k", 4L)) === 1)
    assert(partitions(p, EqualTo("k", 7L)) === 1)
    // IN across both parities needs both; IN within one parity needs one
    assert(partitions(p, In("k", Array[Any](4L, 7L))) === 2)
    assert(partitions(p, In("k", Array[Any](4L, 8L))) === 1)
    // string column blooms prune the same way
    assert(partitions(p, EqualTo("v", "odd3")) === 1)
    // correctness: the kept segment serves the row; absent keys return none
    import org.apache.spark.sql.functions.col
    assert(KvStore.read(spark, p).filter(col("k") === 4L).count() === 1L)
    assert(KvStore.read(spark, p).filter(col("v") === "odd3").count() === 1L)
    // an in-range key that was never written: blooms prune BOTH segments
    // (evens stop at 18, odds are odd — 21 is outside both sets… use 20:
    // even-range max is 18 so stats prune evens; odds bloom-prunes 20)
    assert(partitions(p, EqualTo("k", 20L)) === 0)
    assert(KvStore.read(spark, p).filter(col("k") === 20L).count() === 0L)
  }

  test("point DELETE on a bloom-absent key burns no version and writes no dv") {
    val p = tmp()
    spark.range(0, 10).selectExpr("id * 2 as k").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val v0 = KvStore.readVersionedManifest(conf, p)._1
    // k=7 sits inside [0,18] (stats keep the segment) but the bloom knows
    // the key set is even — the delete classifies it untouched, no job
    KvCatalogTable.deleteRows(spark, p, KvStore.readSchema(conf, p).get,
      Array(EqualTo("k", 7L)), p)
    assert(KvStore.readVersionedManifest(conf, p)._1 === v0)
    assert(KvStore.readManifest(conf, p).flatMap(_.segs).forall(_.dv.isEmpty))
    assert(KvStore.read(spark, p).count() === 10L)
  }

  test("long string stats truncate to sound bounds (no kilobyte manifests)") {
    val p = tmp()
    import spark.implicits._
    val longA = "a" * 200
    val longZ = "y" * 150 + "z" * 50
    Seq((1L, longA), (2L, longZ), (3L, "middle"))
      .toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val st = KvStore.readManifest(conf, p).head.segs.head.stats.get
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(st)
    val vMin = node.get("cols").get("v").get("min").asText()
    val vMax = node.get("cols").get("v").get("max").asText()
    assert(vMin.length <= 64 && vMax.length <= 64, s"stats not truncated: $st")
    assert(vMin === "a" * 64, "min is a prefix of the true minimum")
    assert(vMax === "y" * 63 + "z", "max increments the last prefix char")
    // bounds stay SOUND: present values are never pruned away…
    assert(partitions(p, EqualTo("v", longA)) === 1)
    assert(partitions(p, EqualTo("v", longZ)) === 1)
    assert(partitions(p, EqualTo("v", "middle")) === 1)
    // …and provably-outside values still prune (below the truncated min)
    assert(partitions(p, EqualTo("v", "Zebra")) === 0)
    // a metadata DELETE on the single long value must NOT whole-drop the
    // segment off truncated equality — it row-deletes exactly one row
    KvCatalogTable.deleteRows(spark, p, KvStore.readSchema(conf, p).get,
      Array(EqualTo("v", longA)), p)
    assert(KvStore.read(spark, p).count() === 2L)
    assert(KvStore.readManifest(conf, p).head.segs.nonEmpty,
      "segment survives with a dv; truncation never fakes a full match")
  }

  test("clustered compaction: disjoint key ranges, point lookup prunes on stats alone") {
    val p = tmp()
    // four epochs, each spanning the WHOLE key space (k % 4 == e): before
    // clustering, every range overlaps every lookup
    (0 until 4).foreach { e =>
      spark.range(0, 25).selectExpr(s"id * 4 + $e as k", "'v' as v").coalesce(1)
        .write.format("graft-kv").option("path", p).mode("append").save()
    }
    assert(partitions(p, EqualTo("k", 42L)) === 1,
      "pre-clustering only the BLOOM narrows an interleaved point lookup")
    KvStore.compact(spark, p, Seq("k"), clusterByKey = true, numSegments = Some(4))
    val manifest = KvStore.readManifest(conf, p)
    assert(manifest.length === 1 && manifest.head.segs.length === 4)
    // stats ranges are pairwise disjoint after the range exchange
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    val ranges = manifest.head.segs.flatMap(_.stats).map(mapper.readTree)
      .map(st => (st.get("cols").get("k").get("min").asLong(),
        st.get("cols").get("k").get("max").asLong())).sortBy(_._1)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping clustered ranges: $ranges")
    }
    // a point lookup and a narrow range scan now prune on min/max alone
    assert(partitions(p, EqualTo("k", 42L)) === 1)
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
    val touched = partitions(p, GreaterThanOrEqual("k", ranges(1)._1),
      LessThanOrEqual("k", ranges(1)._2))
    assert(touched === 1, s"range scan within one cluster touched $touched")
    // and the data survived the rewrite intact
    assert(KvStore.read(spark, p).count() === 100L)
    assert(KvStore.read(spark, p).filter(
      org.apache.spark.sql.functions.col("k") === 42L).count() === 1L)
  }

  test("compaction refreshes blooms; vacuum sweeps orphaned bloom files") {
    val p = tmp()
    spark.range(0, 10).selectExpr("id * 2 as k").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    spark.range(0, 10).selectExpr("id * 2 + 1 as k").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    KvStore.compact(spark, p, Seq("k"))
    val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
    val referenced = KvStore.readManifest(conf, p).flatMap(_.segs.flatMap(_.bloom)).toSet
    assert(referenced.nonEmpty, "compacted segments carry fresh blooms")
    KvStore.vacuum(p, graceMs = 0L)
    val onDisk = fs.listStatus(KvBloom.bloomsDir(p)).filter(_.isFile)
      .map(_.getPath.getName).toSet
    assert(onDisk === referenced, "only referenced blooms survive vacuum")
    // pruning still works against the compacted store
    assert(partitions(p, EqualTo("k", 999L)) === 0)
  }
}
