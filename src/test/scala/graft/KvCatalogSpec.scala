package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * SQL DDL surface of the kv store (`GraftKvCatalog`): create/insert/select
 * round trips, metadata-column semantics, time travel, widening-only ALTER,
 * pruned scans, namespace ops, and rename/drop.
 */
class KvCatalogSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse = {
    val dir = java.nio.file.Files.createTempDirectory("graft_kvcat_").toString
    spark.conf.set("spark.sql.catalog.kvtest", "graft.sinks.v2.GraftKvCatalog")
    spark.conf.set("spark.sql.catalog.kvtest.warehouse", dir)
    dir
  }

  private def sql(q: String) = { warehouse; spark.sql(q) }

  test("CREATE TABLE + INSERT INTO + SELECT round-trips through SQL only") {
    sql("CREATE TABLE kvtest.ns.verdicts (ip STRING, clicks BIGINT, bot BOOLEAN)")
    sql("INSERT INTO kvtest.ns.verdicts VALUES ('1.2.3.4', 10, true), ('5.6.7.8', 2, false)")
    val rows = sql("SELECT ip, clicks, bot FROM kvtest.ns.verdicts ORDER BY ip").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq ===
      Seq(("1.2.3.4", 10L, true), ("5.6.7.8", 2L, false)))
    // SHOW TABLES sees it
    val shown = sql("SHOW TABLES IN kvtest.ns").collect().map(_.getString(1))
    assert(shown.contains("verdicts"))
  }

  test("_epoch is a METADATA column: absent from star, selectable by name") {
    sql("CREATE TABLE kvtest.ns.meta_t (k BIGINT, v STRING)")
    sql("INSERT INTO kvtest.ns.meta_t VALUES (1, 'a')")
    sql("INSERT INTO kvtest.ns.meta_t VALUES (2, 'b')")
    assert(sql("SELECT * FROM kvtest.ns.meta_t").columns.toSeq === Seq("k", "v"))
    val withEpoch = sql("SELECT k, _epoch FROM kvtest.ns.meta_t ORDER BY k").collect()
    assert(withEpoch.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 0L), (2L, 1L))) // one committed epoch per INSERT
  }

  test("VERSION AS OF time-travels on the epoch manifest") {
    sql("CREATE TABLE kvtest.ns.tt (k BIGINT)")
    sql("INSERT INTO kvtest.ns.tt VALUES (1)")
    sql("INSERT INTO kvtest.ns.tt VALUES (2)")
    assert(sql("SELECT * FROM kvtest.ns.tt").count() === 2)
    assert(sql("SELECT * FROM kvtest.ns.tt VERSION AS OF 0").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("ALTER TABLE ADD COLUMN widens; old rows read null; retype refused") {
    sql("CREATE TABLE kvtest.ns.ev (k BIGINT, v STRING)")
    sql("INSERT INTO kvtest.ns.ev VALUES (1, 'x')")
    sql("ALTER TABLE kvtest.ns.ev ADD COLUMN score DOUBLE")
    sql("INSERT INTO kvtest.ns.ev VALUES (2, 'y', 0.5)")
    val rows = sql("SELECT k, score FROM kvtest.ns.ev ORDER BY k").collect()
    assert(rows(0).isNullAt(1) && rows(1).getDouble(1) === 0.5)
    intercept[Exception](sql("ALTER TABLE kvtest.ns.ev DROP COLUMN v"))
  }

  test("scans prune to the requested columns") {
    sql("CREATE TABLE kvtest.ns.wide (a BIGINT, b STRING, c DOUBLE, d BOOLEAN)")
    sql("INSERT INTO kvtest.ns.wide VALUES (1, 'x', 1.0, true)")
    val df = sql("SELECT a FROM kvtest.ns.wide")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) === Seq("a"), scan.toString)
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("CTAS creates the store and loads it in one statement") {
    warehouse
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("ctas_src")
    sql("CREATE TABLE kvtest.ns.ctas AS SELECT k, v FROM ctas_src")
    assert(sql("SELECT count(*) AS n FROM kvtest.ns.ctas").collect()(0).getLong(0) === 2L)
  }

  test("rename and drop; namespaces list and drop") {
    sql("CREATE TABLE kvtest.ns2.a (k BIGINT)")
    sql("INSERT INTO kvtest.ns2.a VALUES (7)")
    sql("ALTER TABLE kvtest.ns2.a RENAME TO ns2.b")
    assert(sql("SELECT * FROM kvtest.ns2.b").count() === 1)
    intercept[Exception](sql("SELECT * FROM kvtest.ns2.a").collect())
    sql("DROP TABLE kvtest.ns2.b")
    assert(!sql("SHOW TABLES IN kvtest.ns2").collect().map(_.getString(1)).contains("b"))
    val namespaces = sql("SHOW NAMESPACES IN kvtest").collect().map(_.getString(0))
    assert(namespaces.contains("ns2"))
  }

  test("streaming writeStream.toTable lands exactly-once epochs in the store") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    sql("CREATE TABLE kvtest.ns.streamed (k BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(1L, 2L, 3L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kvcat_ck_").toString
    val q = mem.toDF().toDF("k").writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable("kvtest.ns.streamed")
    q.awaitTermination(60000)
    assert(sql("SELECT * FROM kvtest.ns.streamed").count() === 3)
  }

  test("unsupported column types are refused at CREATE time") {
    intercept[Exception](
      sql("CREATE TABLE kvtest.ns.badtype (k BIGINT, arr ARRAY<BIGINT>)"))
  }

  test("key filter pushdown: no residual Filter, non-matching segments skipped") {
    sql("CREATE TABLE kvtest.ns.pruned (k BIGINT, v STRING)")
    // three epochs with disjoint key ranges; single-partition range() → one
    // writer task → one segment each, so segment count == epoch count
    sql("INSERT INTO kvtest.ns.pruned SELECT id, concat('a', id) FROM range(0, 10, 1, 1)")
    sql("INSERT INTO kvtest.ns.pruned SELECT id, concat('b', id) FROM range(100, 110, 1, 1)")
    sql("INSERT INTO kvtest.ns.pruned SELECT id, concat('c', id) FROM range(200, 210, 1, 1)")
    val all = sql("SELECT * FROM kvtest.ns.pruned")
    assert(all.rdd.getNumPartitions === 3) // one partition per segment

    // equality: fully absorbed — no residual FilterExec, 2 of 3 segments pruned
    val eq = sql("SELECT * FROM kvtest.ns.pruned WHERE k = 105")
    val filters = eq.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }
    assert(filters.isEmpty, eq.queryExecution.executedPlan.toString)
    assert(eq.rdd.getNumPartitions === 1)
    val row = eq.collect()
    assert(row.length === 1 && row(0).getString(1) === "b105")

    // range: only the matching segment survives planning
    val rng = sql("SELECT * FROM kvtest.ns.pruned WHERE k >= 200")
    assert(rng.rdd.getNumPartitions === 1)
    assert(rng.count() === 10)
    // string bounds prune too
    val sf = sql("SELECT * FROM kvtest.ns.pruned WHERE v = 'a3'")
    assert(sf.rdd.getNumPartitions === 1)
    assert(sf.collect().map(_.getLong(0)).toSeq === Seq(3L))
    // filter column outside the projection still evaluates row-exactly
    val proj = sql("SELECT v FROM kvtest.ns.pruned WHERE k = 7")
    assert(proj.collect().map(_.getString(0)).toSeq === Seq("a7"))
    // _epoch metadata filter prunes by the manifest itself
    val ep = sql("SELECT k FROM kvtest.ns.pruned WHERE _epoch = 1")
    assert(ep.rdd.getNumPartitions === 1)
    assert(ep.collect().map(_.getLong(0)).sorted.toSeq === (100L until 110L))
    // an unsupported predicate stays residual and still answers correctly
    val res = sql("SELECT k FROM kvtest.ns.pruned WHERE k % 100 = 5")
    assert(res.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 105L, 205L))
    // nothing-matches prunes everything without an error
    assert(sql("SELECT * FROM kvtest.ns.pruned WHERE k = 999").count() === 0)
  }

  test("filter pushdown composes with time travel and survives compaction") {
    sql("CREATE TABLE kvtest.ns.prunett (k BIGINT, v STRING)")
    sql("INSERT INTO kvtest.ns.prunett VALUES (1, 'one'), (2, 'two')")
    sql("INSERT INTO kvtest.ns.prunett VALUES (3, 'three')")
    // time travel restricts epochs; the filter prunes within the snapshot
    val tt = sql("SELECT v FROM kvtest.ns.prunett VERSION AS OF 0 WHERE k = 3")
    assert(tt.count() === 0)
    val tt2 = sql("SELECT v FROM kvtest.ns.prunett VERSION AS OF 1 WHERE k = 3")
    assert(tt2.collect().map(_.getString(0)).toSeq === Seq("three"))
    // compaction rewrites segments through the normal writer → fresh stats
    graft.sinks.v2.KvStore.compact(spark, s"$warehouse/ns/prunett", Seq("k"))
    val post = sql("SELECT v FROM kvtest.ns.prunett WHERE k = 2")
    assert(post.collect().map(_.getString(0)).toSeq === Seq("two"))
  }

  test("DELETE: epoch rollback, range-aligned metadata delete, dv partial delete, truncate") {
    sql("CREATE TABLE kvtest.ns.del (k BIGINT, v STRING)")
    sql("INSERT INTO kvtest.ns.del SELECT id, concat('a', id) FROM range(0, 10, 1, 1)")
    sql("INSERT INTO kvtest.ns.del SELECT id, concat('b', id) FROM range(100, 110, 1, 1)")
    sql("INSERT INTO kvtest.ns.del SELECT id, concat('c', id) FROM range(200, 210, 1, 1)")
    // epoch rollback: yank the poisoned micro-batch, others untouched
    sql("DELETE FROM kvtest.ns.del WHERE _epoch = 1")
    assert(sql("SELECT count(*) FROM kvtest.ns.del").collect()(0).getLong(0) === 20L)
    assert(sql("SELECT * FROM kvtest.ns.del WHERE k >= 100 AND k < 200").count() === 0)
    // epoch ENTRIES survive (idempotence tags must keep absorbing replays)
    assert(graft.sinks.v2.KvStore.latestEpoch(s"$warehouse/ns/del") === Some(2L))
    // range-aligned delete drops the whole segment it covers
    sql("DELETE FROM kvtest.ns.del WHERE k >= 200")
    assert(sql("SELECT count(*) FROM kvtest.ns.del").collect()(0).getLong(0) === 10L)
    // a partial overlap is not metadata-only: it lands as a deletion
    // vector — row-exact, the segment file untouched
    sql("DELETE FROM kvtest.ns.del WHERE k = 5")
    assert(sql("SELECT count(*) FROM kvtest.ns.del").collect()(0).getLong(0) === 9L)
    assert(sql("SELECT * FROM kvtest.ns.del WHERE k = 5").count() === 0)
    // a second partial delete UNIONS into a fresh dv (old one to vacuum)
    sql("DELETE FROM kvtest.ns.del WHERE k IN (2, 7)")
    assert(sql("SELECT count(*) FROM kvtest.ns.del").collect()(0).getLong(0) === 7L)
    assert(sql("SELECT sum(k) FROM kvtest.ns.del").collect()(0).getLong(0) ===
      (0L until 10L).sum - 5 - 2 - 7)
    // TRUNCATE = delete-all; epoch numbering continues after
    sql("TRUNCATE TABLE kvtest.ns.del")
    assert(sql("SELECT count(*) FROM kvtest.ns.del").count() === 1) // count row
    assert(sql("SELECT * FROM kvtest.ns.del").count() === 0)
    sql("INSERT INTO kvtest.ns.del VALUES (7, 'post')")
    assert(sql("SELECT _epoch FROM kvtest.ns.del").collect()(0).getLong(0) === 3L)
  }

  test("INSERT OVERWRITE replaces all committed state; epochs keep advancing") {
    sql("CREATE TABLE kvtest.ns.ovw (k BIGINT, v STRING)")
    sql("INSERT INTO kvtest.ns.ovw VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO kvtest.ns.ovw VALUES (3, 'c')")
    sql("INSERT OVERWRITE kvtest.ns.ovw VALUES (9, 'z')")
    val rows = sql("SELECT k, v, _epoch FROM kvtest.ns.ovw").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((9L, "z")))
    // the overwrite epoch continues past the replaced history
    assert(rows(0).getLong(2) === 2L)
    // dataframe-surface overwrite mode rides the same path
    Seq((10L, "y")).toDF("k", "v").write.format("graft-kv")
      .option("path", s"$warehouse/ns/ovw").mode("overwrite").save()
    assert(sql("SELECT k FROM kvtest.ns.ovw").collect().map(_.getLong(0)).toSeq === Seq(10L))
  }

  test("streaming Complete mode overwrites the store per epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    sql("CREATE TABLE kvtest.ns.complete (k BIGINT, n BIGINT)")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kvcat_cm_").toString
    val q = mem.toDF().toDF("k").groupBy("k").count().toDF("k", "n").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .toTable("kvtest.ns.complete")
    mem.addData(1L, 1L, 2L)
    q.awaitTermination(60000)
    val q2 = mem.toDF().toDF("k").groupBy("k").count().toDF("k", "n").writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .toTable("kvtest.ns.complete")
    mem.addData(1L, 3L)
    q2.awaitTermination(60000)
    // Complete mode: the store holds exactly the LATEST full result —
    // counts restored from checkpoint state plus the new data, nothing
    // duplicated from the first epoch's rows
    val out = sql("SELECT k, n FROM kvtest.ns.complete").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("TIMESTAMP AS OF resolves commits by wall-clock") {
    def utc(i: java.time.Instant): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC).format(i)
    sql("CREATE TABLE kvtest.ns.tsv (k BIGINT)")
    sql("INSERT INTO kvtest.ns.tsv VALUES (1)") // epoch 0
    val between = java.time.Instant.now()
    Thread.sleep(1100) // ms-granularity commit stamps need daylight
    sql("INSERT INTO kvtest.ns.tsv VALUES (2)") // epoch 1
    val t1 = sql(s"SELECT k FROM kvtest.ns.tsv TIMESTAMP AS OF '${utc(between)}'")
      .collect().map(_.getLong(0)).toSeq
    assert(t1 === Seq(1L))
    val now = java.time.Instant.now().plusSeconds(1)
    assert(sql(s"SELECT k FROM kvtest.ns.tsv TIMESTAMP AS OF '${utc(now)}'")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // a timestamp before the first commit names no state
    val e = intercept[Exception](
      sql("SELECT * FROM kvtest.ns.tsv TIMESTAMP AS OF '2000-01-01 00:00:00'").collect())
    assert(e.getMessage.contains("no epoch committed"), e.toString)
  }

  test("VERSION AS OF presents the schema of that epoch, not post-ALTER columns") {
    sql("CREATE TABLE kvtest.ns.ttschema (k BIGINT)")
    sql("INSERT INTO kvtest.ns.ttschema VALUES (1)") // epoch 0, schema (k)
    sql("ALTER TABLE kvtest.ns.ttschema ADD COLUMN v STRING")
    sql("INSERT INTO kvtest.ns.ttschema VALUES (2, 'x')") // epoch 1, schema (k, v)
    // snapshot semantics (Delta/Iceberg-style): the pre-ALTER epoch shows
    // the pre-ALTER schema — no phantom null column
    assert(sql("SELECT * FROM kvtest.ns.ttschema VERSION AS OF 0").columns.toSeq === Seq("k"))
    assert(sql("SELECT * FROM kvtest.ns.ttschema VERSION AS OF 1").columns.toSeq === Seq("k", "v"))
    // a second widening keeps each epoch pinned to ITS schema
    sql("ALTER TABLE kvtest.ns.ttschema ADD COLUMN w DOUBLE")
    sql("INSERT INTO kvtest.ns.ttschema VALUES (3, 'y', 0.5)") // epoch 2
    assert(sql("SELECT * FROM kvtest.ns.ttschema VERSION AS OF 0").columns.toSeq === Seq("k"))
    assert(sql("SELECT * FROM kvtest.ns.ttschema VERSION AS OF 1").columns.toSeq === Seq("k", "v"))
    assert(sql("SELECT * FROM kvtest.ns.ttschema VERSION AS OF 2").columns.toSeq === Seq("k", "v", "w"))
    // the current read sees everything, old rows null-filled
    assert(sql("SELECT * FROM kvtest.ns.ttschema").columns.toSeq === Seq("k", "v", "w"))
    assert(sql("SELECT * FROM kvtest.ns.ttschema").count() === 3)
  }

  test("changefeed x schema evolution: a feed carries its START schema for " +
      "life; restart presents the widened schema with null backfill") {
    // THE CONTRACT (pinned here): a streaming read is analyzed once, so a
    // feed presents the table schema captured at query start for every
    // batch it ever emits — epochs written under a WIDER schema are
    // projected down (the reader decodes only requested fields), and after
    // a consumer restart the feed presents the widened schema, with rows
    // from pre-ALTER epochs null-backfilled. This is latest-schema-at-
    // start, not per-epoch schema: per-epoch presentation is the TIME
    // TRAVEL contract (VERSION AS OF pins the old schema); a single
    // streaming Dataset cannot change shape mid-query.
    val name = "kvtest.ns.feedalter"
    sql(s"CREATE TABLE $name (k BIGINT, v STRING)")
    sql(s"INSERT INTO $name VALUES (1, 'a')")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kv-alter-ck").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Set[(Long, String)])]
    def drainInto(buf: scala.collection.mutable.ArrayBuffer[(Seq[String], Set[(Long, String)])]) = {
      val q = spark.readStream.table(name)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.collect().map(r => (r.getLong(0), r.getString(1))).toSet
          buf.synchronized { buf += ((b.columns.toSeq, rows)) }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    drainInto(batches) // epoch 0 under (k, v)
    assert(batches.nonEmpty && batches.head._1 === Seq("k", "v"))
    assert(batches.head._2 === Set((1L, "a")))
    // schema widens; an epoch lands with the new column populated
    sql(s"ALTER TABLE $name ADD COLUMN w DOUBLE")
    sql(s"INSERT INTO $name VALUES (2, 'b', 2.5)")
    // the same checkpoint, consumer restarted: the feed now presents the
    // WIDENED schema and emits only the new epoch, w populated
    val batches2 = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Set[(Long, String)])]
    val q2 = spark.readStream.table(name)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getString(1))).toSet
        val ws = b.collect().map(r => Option(r.get(2))).toSeq
        batches2.synchronized { batches2 += ((b.columns.toSeq, rows)) }
        assert(ws === Seq(Some(2.5)), s"post-ALTER epoch must carry w, got $ws")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    assert(batches2.map(_._1).toSeq === Seq(Seq("k", "v", "w")))
    assert(batches2.head._2 === Set((2L, "b")))
    // a FRESH consumer re-reads the whole chain under the widened schema:
    // the pre-ALTER epoch's rows null-backfill w
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-kv-alter-ck2").toString
    val all = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Option[Any])]
    val q3 = spark.readStream.table(name)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
        all.synchronized { all ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q3.awaitTermination(60000)
    assert(all.toSet === Set((1L, "a", None), (2L, "b", Some(2.5))))
  }

  test("DROP NAMESPACE on a non-empty namespace raises the Spark error class") {
    sql("CREATE TABLE kvtest.ns3.keep (k BIGINT)")
    // the catalog throws NonEmptyNamespaceException; Spark's DROP NAMESPACE
    // exec surfaces it as the SCHEMA_NOT_EMPTY analysis error condition —
    // the proper error class, not an internal error
    val e = intercept[org.apache.spark.sql.AnalysisException](
      sql("DROP NAMESPACE kvtest.ns3"))
    assert(Option(e.getCondition).exists(_.contains("NOT_EMPTY")), e.toString)
    sql("DROP NAMESPACE kvtest.ns3 CASCADE")
    assert(!sql("SHOW NAMESPACES IN kvtest").collect().map(_.getString(0)).contains("ns3"))
  }
}
