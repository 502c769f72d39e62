package graft.sinks.v2

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions.{col, concat, lit}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Atomic UPSERT (merge) for graft-kv: matched keys replaced via deletion
 * vectors, unmatched keys inserted as one new epoch, both under a single
 * manifest CAS. In-package to read manifests and versions directly.
 */
object KvUpsertSpec {
  /** evaluation counter for the non-determinism test — a static so the
   * task closure and the driver see one instance under local mode */
  val evals = new java.util.concurrent.atomic.AtomicInteger()
}

class KvUpsertSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_kvups_").toString + "/store"

  private def conf = spark.sessionState.newHadoopConf()

  private def visible(p: String): Map[Long, String] =
    KvStore.readCurrent(spark, p, Seq("k")).collect()
      .map(r => r.getLong(r.fieldIndex("k")) -> r.getString(r.fieldIndex("v"))).toMap

  test("upsert replaces matched keys, inserts new ones, keeps the rest — in ONE version") {
    val p = tmp()
    // epoch 0: keys 0..9; epoch 1: keys 10..14 (the merge spans epochs)
    spark.range(0, 10).selectExpr("id as k", "'old0' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    spark.range(10, 15).selectExpr("id as k", "'old1' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val v0 = KvStore.readVersionedManifest(conf, p)._1

    // updates 5..12 (both epochs) + inserts 20..22
    val src = (5L to 12L).map(k => (k, "new")) ++ (20L to 22L).map(k => (k, "new"))
    KvStore.upsert(spark, p, src.toDF("k", "v"), Seq("k"))

    assert(KvStore.readVersionedManifest(conf, p)._1 === v0 + 1,
      "dv swaps + epoch append must land as ONE manifest version")
    val got = visible(p)
    val want = ((0L to 4L).map(_ -> "old0") ++ (5L to 12L).map(_ -> "new") ++
      (13L to 14L).map(_ -> "old1") ++ (20L to 22L).map(_ -> "new")).toMap
    assert(got === want)
    // new rows live in exactly one fresh epoch above the old maximum
    val epochs = KvStore.read(spark, p).filter(col("v") === "new")
      .select("_epoch").distinct().collect().map(_.getLong(0)).toSet
    assert(epochs === Set(2L))
    // the first-write-wins winner for a replaced key IS the new epoch
    // (the old rows are dv-gone, not merely shadowed)
    assert(KvStore.read(spark, p).filter(col("k") === 7L).count() === 1L)
  }

  test("disjoint-key upsert is a pure insert: no segment gains a dv") {
    val p = tmp()
    // evens live in the store; odd upsert keys sit INSIDE the min/max
    // range, so only the bloom (or the row-exact pass) can classify them
    spark.range(0, 10).selectExpr("id * 2 as k", "'old' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    KvStore.upsert(spark, p,
      Seq((3L, "new"), (5L, "new")).toDF("k", "v"), Seq("k"))
    assert(KvStore.readManifest(conf, p).flatMap(_.segs).forall(_.dv.isEmpty),
      "no matched rows => no deletion vectors anywhere")
    val got = visible(p)
    assert(got.size === 12 && got(3L) === "new" && got(4L) === "old")
    // and the bloom alone already proves the segment untouchable
    val seg = KvStore.readManifest(conf, p).head.segs.head
    assert(KvBloom.pruneSegment(conf, p, seg.bloom,
      KvStore.readSchema(conf, p).get,
      Seq(org.apache.spark.sql.sources.In("k", Array[Any](3L, 5L)))))
  }

  test("null source keys never match — they insert, like SQL MERGE's null join") {
    val p = tmp()
    spark.range(0, 5).selectExpr("id as k", "'old' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val src = Seq((java.lang.Long.valueOf(2L), "new"), (null.asInstanceOf[java.lang.Long], "nullkey"))
      .toDF("k", "v")
    KvStore.upsert(spark, p, src, Seq("k"))
    // k=2 replaced; the null-key row INSERTED (visible to raw reads — the
    // keyed readCurrent view ignores null-key rows by its join contract)
    assert(visible(p) === Map(0L -> "old", 1L -> "old", 2L -> "new",
      3L -> "old", 4L -> "old"))
    assert(KvStore.read(spark, p).filter(col("k").isNull)
      .select("v").collect().map(_.getString(0)).toSeq === Seq("nullkey"))
    // and no old row was dv-matched by the null (only k=2's epoch-0 row)
    assert(KvStore.read(spark, p).filter(col("v") === "old").count() === 4L)
  }

  test("upsert on an empty store is a plain first write") {
    val p = tmp()
    KvStore.upsert(spark, p, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    assert(visible(p) === Map(1L -> "a"))
  }

  test("key-cap guard names the bulk-merge escape hatch") {
    val p = tmp()
    spark.range(0, 3).selectExpr("id as k", "'x' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val e = intercept[IllegalArgumentException] {
      KvStore.upsert(spark, p,
        spark.range(0, 100).selectExpr("id as k", "'y' as v"), Seq("k"),
        maxUpsertKeys = 10)
    }
    assert(e.getMessage.contains("bulk") && e.getMessage.contains("100") === false)
    assert(visible(p).values.forall(_ == "x"), "failed upsert changes nothing")
  }

  test("update: copy-on-write over the current snapshot, merged back by key") {
    val p = tmp()
    spark.range(0, 6).selectExpr("id as k", "concat('v', id) as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    KvStore.update(spark, p, Seq("k"), col("k") >= 4L,
      Map("v" -> concat(col("v"), lit("!"))))
    assert(visible(p) === Map(0L -> "v0", 1L -> "v1", 2L -> "v2",
      3L -> "v3", 4L -> "v4!", 5L -> "v5!"))
  }

  test("tagged upsert absorbs replays: the streaming foreachBatch CDC-apply contract") {
    val p = tmp()
    spark.range(0, 5).selectExpr("id as k", "'old' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val batch = Seq((2L, "new"), (7L, "new")).toDF("k", "v")
    KvStore.upsert(spark, p, batch, Seq("k"), tag = Some("cdc:q1:0"))
    val v1 = KvStore.readVersionedManifest(conf, p)._1
    val snap1 = visible(p)
    assert(snap1(2L) === "new" && snap1(7L) === "new")
    // replay of the same batch id: version untouched, state identical —
    // even with DIFFERENT row content (the tag, not the data, is identity)
    KvStore.upsert(spark, p, Seq((2L, "evil-replay")).toDF("k", "v"),
      Seq("k"), tag = Some("cdc:q1:0"))
    assert(KvStore.readVersionedManifest(conf, p)._1 === v1)
    assert(visible(p) === snap1)
    // the NEXT batch id applies normally
    KvStore.upsert(spark, p, Seq((2L, "newer")).toDF("k", "v"),
      Seq("k"), tag = Some("cdc:q1:1"))
    assert(visible(p)(2L) === "newer")
    // end-to-end through a real stream: foreachBatch CDC apply
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("k", "v").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        KvStore.upsert(spark, p, df, Seq("k"), tag = Some(s"cdc:stream:$id"))
      }
      .option("checkpointLocation", tmp() + "/ckpt")
      .start()
    try {
      in.addData((0L, "s0"), (9L, "s9"))
      q.processAllAvailable()
      in.addData((9L, "s9b"))
      q.processAllAvailable()
    } finally q.stop()
    val fin = visible(p)
    assert(fin(0L) === "s0" && fin(9L) === "s9b" && fin(2L) === "newer")
  }

  test("non-deterministic sources: key-collect and staging see ONE evaluation") {
    val p = tmp()
    spark.range(0, 5).selectExpr("id as k", "'old' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    // a source whose rows CHANGE on every evaluation: without the persist
    // inside upsert, key collection and staging would see different keys —
    // the staged row's old twin would never be dv-matched and first-write-
    // wins would silently keep the OLD value
    KvUpsertSpec.evals.set(0)
    val rdd = spark.sparkContext.parallelize(Seq(0), 1).mapPartitions { _ =>
      val c = KvUpsertSpec.evals.incrementAndGet()
      Iterator(org.apache.spark.sql.Row((c % 5).toLong, s"new$c"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    KvStore.upsert(spark, p, spark.createDataFrame(rdd, schema), Seq("k"))
    val got = visible(p)
    assert(got.size === 5, s"no key may vanish or double: $got")
    val replaced = got.filter(_._2.startsWith("new"))
    assert(replaced.size === 1, s"exactly ONE evaluation must land: $got")
    assert(got.values.count(_ == "old") === 4)
  }

  test("many-partition sources switch to the bounded staged-file key pass: same merge, driver bounded") {
    val p = tmp()
    spark.range(0, 8).selectExpr("id as k", "'old' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    // force the budget under numPartitions × (cap+1): the per-partition
    // inline sets are skipped and the distinct keys come from a
    // distributed pass over the staged files (cap+1 driver rows total)
    sys.props("graft.kv.maxDriverKeyReprs") = "1"
    try {
      val src = spark.range(0, 12)
        .selectExpr("id as k", "concat('new', id) as v").repartition(6)
      KvStore.upsert(spark, p, src, Seq("k"))
      val got = visible(p)
      assert(got.size === 12)
      (0L until 12L).foreach(k => assert(got(k) === s"new$k"))
      // over-cap on the bounded path still fail-louds with the named
      // error and reclaims its own staged files
      val e = intercept[IllegalArgumentException] {
        KvStore.upsert(spark, p,
          spark.range(100, 110).selectExpr("id as k", "'x' as v").repartition(5),
          Seq("k"), maxUpsertKeys = 3)
      }
      assert(e.getMessage.contains("distinct keys"))
      assert(visible(p).size === 12, "failed merge must leave the store unchanged")
    } finally sys.props.remove("graft.kv.maxDriverKeyReprs")
  }

  test("update basis guard: a commit after the rows were computed aborts the merge") {
    val p = tmp()
    spark.range(0, 4).selectExpr("id as k", "'old' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val basis = KvStore.readManifest(conf, p)
    // rows derived from `basis`…
    val derived = KvStore.readCurrent(spark, p, Seq("k"))
      .withColumn("v", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.col("v"),
        org.apache.spark.sql.functions.lit("+")))
    // …then a concurrent commit lands before the merge
    Seq((100L, "concurrent")).toDF("k", "v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val e = intercept[java.io.IOException] {
      KvStore.upsertImpl(spark, p, derived, Seq("k"), 1000000, None, Some(basis))
    }
    assert(e.getMessage.contains("optimistic-concurrency"), e.getMessage)
    val got = visible(p)
    assert(got(100L) === "concurrent" && got(0L) === "old",
      "store unchanged: the stale-derived merge must not land")
  }

  test("tagged upsert on an EMPTY store records the tag: first-batch replays absorb") {
    val p = tmp()
    KvStore.upsert(spark, p, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      Seq("k"), tag = Some("cdc:first:0"))
    assert(visible(p) === Map(1L -> "a", 2L -> "b"))
    // the replayed first batch — with DIVERGENT content — must be a no-op
    KvStore.upsert(spark, p, Seq((1L, "evil")).toDF("k", "v"),
      Seq("k"), tag = Some("cdc:first:0"))
    assert(visible(p) === Map(1L -> "a", 2L -> "b"))
    assert(KvStore.readManifest(conf, p).map(_.tag) === Seq("cdc:first:0"))
  }

  test("multi-column key encoding is injective across separator-bearing strings") {
    val p = tmp()
    Seq(("x", "y\u0000z", "stored")).toDF("a", "b", "v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    // a DIFFERENT key whose naive concatenation collides: must insert,
    // never tombstone the stored row
    KvStore.upsert(spark, p,
      Seq(("x\u0000y", "z", "incoming")).toDF("a", "b", "v"), Seq("a", "b"))
    assert(KvStore.read(spark, p).count() === 2L)
    assert(KvStore.readManifest(conf, p).flatMap(_.segs).forall(_.dv.isEmpty),
      "no dv: the keys differ, nothing may be replaced")
    val vals = KvStore.readCurrent(spark, p, Seq("a", "b"))
      .select("v").collect().map(_.getString(0)).toSet
    assert(vals === Set("stored", "incoming"))
  }

  test("OCC: concurrent appends during upserts are never lost") {
    val p = tmp()
    spark.range(0, 10).selectExpr("id as k", "'old' as v").coalesce(1)
      .write.format("graft-kv").option("path", p).mode("append").save()
    val pool = Executors.newFixedThreadPool(6)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // 3 upserters over disjoint key slices × 3 appenders of fresh keys
    val tasks =
      (0 until 3).map { u => () =>
        val keys = (u * 3).toLong to (u * 3 + 2).toLong
        KvStore.upsert(spark, p,
          keys.map(k => (k, s"new$u")).toDF("k", "v"), Seq("k"))
      } ++ (0 until 3).map { a => () =>
        Seq((1000L + a, s"app$a")).toDF("k", "v").coalesce(1)
          .write.format("graft-kv").option("path", p).mode("append").save()
      }
    tasks.foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try t() catch { case e: Throwable => errs.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    // upserts may legitimately exhaust their OCC retries under this storm;
    // anything else is a bug. Retry stragglers once on the quiet store.
    errs.forEach { e =>
      assert(e.getMessage != null && e.getMessage.contains("optimistic-concurrency"),
        s"unexpected failure: $e")
    }
    val got = visible(p)
    (0 until 3).foreach { a => assert(got(1000L + a) === s"app$a", "append lost") }
    (0L to 9L).foreach { k =>
      val v = got(k)
      assert(v == "old" || v.startsWith("new"), s"k=$k got $v")
    }
    // every key resolves to exactly ONE visible row (no double-commit)
    val counts = KvStore.readCurrent(spark, p, Seq("k"))
      .groupBy("k").count().filter(col("count") > 1).count()
    assert(counts === 0L)
    // and the store carries no planted orphans beyond replaced dvs
    KvStore.vacuum(p, graceMs = 0L)
    assert(visible(p) === got, "vacuum must not disturb visible state")
  }
}
