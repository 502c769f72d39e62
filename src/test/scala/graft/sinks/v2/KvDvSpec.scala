package graft.sinks.v2

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/**
 * Deletion vectors (merge-on-read DELETE) for `graft-kv`: codec
 * round-trips, the physical-row DELETE contract against first-write-wins
 * resolution, changefeed and time-travel visibility, compaction folding,
 * and vacuum's sweep of replaced/orphaned DV files. In-package to drive
 * `KvCatalogTable.deleteRows` and [[KvDv]] directly.
 */
class KvDvSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_kvdv_").toString + "/store"

  private def conf = spark.sessionState.newHadoopConf()

  private def del(p: String, fs: org.apache.spark.sql.sources.Filter*): Unit =
    KvCatalogTable.deleteRows(spark, p, KvStore.readSchema(conf, p).get,
      fs.toArray, p)

  test("varint codec round-trips edge shapes") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(0L, 1L, 2L, 3L),                       // adjacent run
      Array(5L, 1000000L, (1L << 40) + 7L),        // large gaps past 2^31
      (0L until 1000L).map(_ * 3).toArray)         // regular stride
    cases.foreach { c =>
      assert(KvDv.decode(KvDv.encode(c)).toSeq === c.toSeq)
    }
    // gap encoding stays compact on clustered deletes
    val run = (1000L until 2000L).toArray
    assert(KvDv.encode(run).length < run.length * 2 + 8)
  }

  test("physical-row DELETE: resolution runs over survivors (un-shadow pinned)") {
    val p = tmp()
    // epoch 0: (1,"old") wins k=1 under first-write-wins; epoch 1: (1,"new")
    Seq((1L, "old"), (2L, "keep")).toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    Seq((1L, "new")).toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val before = KvStore.readCurrent(spark, p, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before === Map(1L -> "old", 2L -> "keep"))
    // DELETE WHERE v='old' hits ONE physical row (the epoch-0 winner).
    // Contract: DELETE operates on physical rows; first-write-wins then
    // resolves over the SURVIVORS — so the epoch-1 row for k=1 surfaces.
    // Callers deleting a KEY for good filter on the key, which removes
    // every version.
    del(p, org.apache.spark.sql.sources.EqualTo("v", "old"))
    val after = KvStore.readCurrent(spark, p, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === Map(1L -> "new", 2L -> "keep"))
    // key-predicate delete removes every version — k=1 is gone for good
    del(p, org.apache.spark.sql.sources.EqualTo("k", 1L))
    assert(KvStore.readCurrent(spark, p, Seq("k")).collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("dv delete: raw reads, filters, time travel and changefeed see survivors only") {
    val p = tmp()
    spark.range(0, 100, 1, 1).selectExpr("id as k", "concat('v', id) as v")
      .write.format("graft-kv").option("path", p).mode("append").save()
    spark.range(100, 200, 1, 1).selectExpr("id as k", "concat('v', id) as v")
      .write.format("graft-kv").option("path", p).mode("append").save()
    del(p, org.apache.spark.sql.sources.GreaterThanOrEqual("k", 50L),
      org.apache.spark.sql.sources.LessThan("k", 150L))
    val df = KvStore.read(spark, p)
    assert(df.count() === 100L)
    assert(df.agg(org.apache.spark.sql.functions.min("k")).head.getLong(0) === 0L)
    // pushed filters compose with the dv (filter evaluates post-skip)
    assert(df.filter($"k" >= 40 && $"k" < 60).count() === 10L)
    // time travel: VERSION AS OF epoch 0 shows epoch-0 SURVIVORS — dv
    // state rides the CURRENT manifest version, exactly like metadata
    // deletes (dropped segments vanish from old versions too); per-epoch
    // ROW history is the changefeed-before-delete's job, not time travel's
    assert(KvStore.readAt(spark, p, 0L).count() === 50L)
    // a fresh changefeed consumer reading the chain post-delete feeds
    // exactly the surviving rows
    val outDir = Files.createTempDirectory("graft-kvdv-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-kvdv-ck").toString
    val q = spark.readStream.format("graft-kv").option("path", p).load()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(outDir).count() === 100L)
  }

  test("compact folds dvs away; vacuum sweeps replaced and orphaned dv files") {
    val p = tmp()
    spark.range(0, 100, 1, 1).selectExpr("id as k", "id * 2 as n")
      .write.format("graft-kv").option("path", p).mode("append").save()
    del(p, org.apache.spark.sql.sources.LessThan("k", 10L))
    del(p, org.apache.spark.sql.sources.GreaterThanOrEqual("k", 90L))
    val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
    val dvDir = KvDv.dvsDir(p)
    // two deletes: first dv + its unioned replacement both on disk,
    // manifest references only the union
    assert(fs.listStatus(dvDir).count(_.isFile) === 2)
    val manifest = KvStore.readManifest(conf, p)
    assert(manifest.flatMap(_.segs).flatMap(_.dv).size === 1)
    // vacuum (zero grace) sweeps the replaced dv, keeps the referenced one
    KvStore.vacuum(p, graceMs = 0L)
    assert(fs.listStatus(dvDir).count(_.isFile) === 1)
    assert(KvStore.read(spark, p).count() === 80L)
    // compaction rewrites survivors into a fresh segment: dv references
    // fold away, the store reads identically, and the last dv file is
    // an orphan for the next vacuum
    KvStore.compact(spark, p, Seq("k"))
    assert(KvStore.readManifest(conf, p).flatMap(_.segs).forall(_.dv.isEmpty))
    assert(KvStore.read(spark, p).count() === 80L)
    KvStore.vacuum(p, graceMs = 0L)
    assert(!fs.exists(dvDir) || fs.listStatus(dvDir).count(_.isFile) === 0)
  }

  test("delete matching nothing is a no-op commit; repeated delete is idempotent") {
    val p = tmp()
    spark.range(0, 10, 1, 1).selectExpr("id as k")
      .write.format("graft-kv").option("path", p).mode("append").save()
    val v0 = KvStore.readVersionedManifest(conf, p)._1
    del(p, org.apache.spark.sql.sources.EqualTo("k", 999L))
    assert(KvStore.readVersionedManifest(conf, p)._1 === v0,
      "nothing matched: no manifest version burned")
    del(p, org.apache.spark.sql.sources.EqualTo("k", 3L))
    val v1 = KvStore.readVersionedManifest(conf, p)._1
    assert(KvStore.read(spark, p).count() === 9L)
    // deleting the same rows again: ordinals already vectored, no change
    del(p, org.apache.spark.sql.sources.EqualTo("k", 3L))
    assert(KvStore.readVersionedManifest(conf, p)._1 === v1)
    assert(KvStore.read(spark, p).count() === 9L)
  }
}
