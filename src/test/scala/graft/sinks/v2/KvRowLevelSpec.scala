package graft.sinks.v2

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/**
 * SQL row-level DML against graft-kv catalog tables: UPDATE, MERGE INTO,
 * and DELETE with predicates the scan cannot push — all planned by Spark's
 * row-level rewrites over the delta-based (merge-on-read) operation, all
 * committed as deletion-vector swaps + one insert epoch under a single
 * manifest CAS ([[KvRowLevelOperation]]).
 */
class KvRowLevelSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def conf = spark.sessionState.newHadoopConf()

  /** fresh catalog + table per test (catalog instances cache per name) */
  private var n = 0
  private def freshTable(rows: Seq[(Long, String, Long)]): (String, String) = {
    n += 1
    val cat = s"kvrl$n"
    val wh = Files.createTempDirectory(s"graft_kvrl_${n}_").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sinks.v2.GraftKvCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    import spark.implicits._
    rows.toDF("k", "v", "amt").createOrReplaceTempView(s"kvrl_src_$n")
    spark.sql(s"CREATE TABLE $cat.ns.t AS SELECT * FROM kvrl_src_$n")
    (s"$cat.ns.t", s"$wh/ns/t")
  }

  private def snap(tbl: String): Set[(Long, String, Long)] =
    spark.sql(s"SELECT k, v, amt FROM $tbl").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("SQL UPDATE rewrites matched rows through the delta writer") {
    val (tbl, path) = freshTable(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    spark.sql(s"UPDATE $tbl SET v = concat(v, '!'), amt = amt * 2 WHERE k >= 2")
    assert(snap(tbl) === Set((1L, "a", 10L), (2L, "b!", 40L), (3L, "c!", 60L)))
    // merge-on-read shape: the original segment survives with a dv; the
    // updated versions live in a NEW epoch
    val m = KvStore.readManifest(conf, path)
    assert(m.length === 2, s"expected base + update epoch, got ${m.length}")
    assert(m.head.segs.exists(_.dv.isDefined), "old rows leave via deletion vector")
    // time travel: epoch 0 pre-update values are gone from history for the
    // matched rows (dv = physical removal, the documented contract) but
    // unmatched rows still read
    assert(KvStore.readAt(spark, path, 0L).count() === 1L)
  }

  test("SQL DELETE with a non-pushable predicate takes the row-level path") {
    val (tbl, path) = freshTable(Seq((1L, "keep", 1L), (2L, "drop-me", 2L),
      (3L, "keeper", 3L), (4L, "dropped", 4L)))
    val v0 = KvStore.readVersionedManifest(conf, path)._1
    // LIKE is not in the scan's pushable set -> Spark must plan WriteDelta
    spark.sql(s"DELETE FROM $tbl WHERE v LIKE 'drop%'")
    assert(snap(tbl).map(_._2) === Set("keep", "keeper"))
    assert(KvStore.readVersionedManifest(conf, path)._1 === v0 + 1,
      "a delete-only statement commits exactly one version (dv swap, no epoch)")
    assert(KvStore.readManifest(conf, path).length === 1,
      "no insert rows => no new epoch appended")
  }

  test("SQL MERGE INTO: matched update, matched delete, not-matched insert") {
    val (tbl, path) = freshTable(Seq((1L, "old", 10L), (2L, "stale", 20L),
      (3L, "old", 30L)))
    import spark.implicits._
    Seq((1L, "upd", 11L), (2L, "del", 0L), (9L, "ins", 99L))
      .toDF("k", "v", "amt").createOrReplaceTempView("kvrl_merge_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING kvrl_merge_src s ON t.k = s.k
         |WHEN MATCHED AND s.v = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
         |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)
         |""".stripMargin)
    assert(snap(tbl) === Set((1L, "upd", 11L), (3L, "old", 30L), (9L, "ins", 99L)))
    // one statement = one committed version: dv swap + insert epoch together
    val m = KvStore.readManifest(conf, path)
    assert(m.length === 2)
    assert(m.head.segs.exists(_.dv.isDefined))
  }

  test("row-level DML on a time-travel snapshot is rejected by name") {
    val (tbl, _) = freshTable(Seq((1L, "a", 1L)))
    spark.sql(s"UPDATE $tbl SET amt = 2 WHERE k = 1") // second version exists
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $tbl VERSION AS OF 0 SET amt = 3 WHERE k = 1")
    }
    assert(e.getMessage.contains("time-travel") || e.getMessage.contains("VERSION"),
      e.getMessage)
  }

  test("pushable DELETE still takes the metadata/dv fast path (no insert epoch)") {
    val (tbl, path) = freshTable(Seq((1L, "a", 1L), (2L, "b", 2L)))
    spark.sql(s"DELETE FROM $tbl WHERE k = 2")
    assert(snap(tbl) === Set((1L, "a", 1L)))
    assert(KvStore.readManifest(conf, path).length === 1,
      "pushable predicate routes to deleteWhere — no row-level epoch")
  }

  test("changefeed contract: row-level DML feeds its INSERT epoch, not its dv deletes") {
    val (tbl, path) = freshTable(Seq((1L, "old", 10L), (2L, "stale", 20L)))
    val outDir = Files.createTempDirectory("graft_kvrl_feed_").toString
    import spark.implicits._
    Seq((1L, "upd", 11L), (9L, "ins", 99L)).toDF("k", "v", "amt")
      .createOrReplaceTempView("kvrl_feed_src")
    spark.sql(
      s"""MERGE INTO $tbl t USING kvrl_feed_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
         |WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)
         |""".stripMargin)
    val q = spark.readStream.format("graft-kv").option("path", path).load()
      .writeStream.format("parquet").option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val fed = spark.read.parquet(s"$outDir/data")
      .select("k", "v", "_epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // the feed is APPEND-SHAPED (the Delta-CDF-without-CDC contract, same
    // as compaction restating): epoch 0 arrives ALREADY dv-filtered (the
    // pre-update row for k=1 is physically removed), and the merge's
    // insert epoch carries the new versions; a delete emits nothing.
    assert(fed === Set((2L, "stale", 0L), (1L, "upd", 1L), (9L, "ins", 1L)))
  }

  test("statement snapshot isolation: a commit landing mid-statement aborts it") {
    val (tbl, path) = freshTable(Seq((1L, "a", 1L), (2L, "b", 2L)))
    val schema = KvStore.readSchema(conf, path).get
    // build the operation (pins the snapshot), then let a concurrent
    // append land, then drive the write commit directly — the CAS must
    // refuse and leave the store unchanged
    val op = new KvRowLevelOperation(path,
      schema, org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE)
    import spark.implicits._
    Seq((5L, "c", 5L)).toDF("k", "v", "amt").coalesce(1)
      .write.format("graft-kv").option("path", path).mode("append").save()
    val e = intercept[java.io.IOException] {
      KvStore.commitRowLevel(conf, path, schema, op.snapshot,
        Nil, Map(KvStore.readManifest(conf, path).head.segs.head.name -> Array(0L)))
    }
    assert(e.getMessage.contains("optimistic-concurrency"))
    assert(KvStore.read(spark, path).count() === 3L, "store unchanged after abort")
    assert(KvStore.readManifest(conf, path).flatMap(_.segs).forall(_.dv.isEmpty))
  }
}
