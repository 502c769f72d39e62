package graft.sinks.v2

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Crash-point fault injection for every kv commit protocol: each test
 * arms one [[Failpoints]] point (a writer "killed" exactly there — files
 * written so far stay, nothing after runs), then asserts the protocol's
 * crash contract:
 *
 *  - a point BEFORE the manifest CAS leaves `readCurrent` exactly the
 *    pre-op state (atomic visibility — a reader never sees a half commit);
 *  - a point AT/AFTER the CAS leaves the post-op state (the commit landed;
 *    only cleanup was lost);
 *  - a RETRY of the same statement (same idempotence tag where the op has
 *    one) converges to the post-op state — replays absorb, never
 *    double-commit;
 *  - `vacuum` reclaims every orphan the crash left (unlisted segments,
 *    staging leftovers, orphan dvs, manifest tmps) without changing
 *    visible state.
 *
 * Plus a seeded random sweep: a multi-op walk (append / upsert / compact /
 * retention fold) with a random point armed at random steps, the state
 * model checked after every op — the differential-test twin of
 * [[KvModelSpec]] with crashes in the loop.
 */
class KvCrashSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  private def conf: Configuration = spark.sessionState.newHadoopConf()

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("v", LongType, nullable = true)))

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft_crash_").toFile
    d.delete() // the store creates it
    d.toString
  }

  /** driver-side staging through the real task writer, `parts` files */
  private def stage(path: String, rows: Seq[(Long, Long)], parts: Int)
      : Seq[KvStore.StagedSeg] =
    rows.grouped(math.max(1, math.ceil(rows.size.toDouble / parts).toInt))
      .zipWithIndex.map { case (chunk, pid) =>
        val w = new KvDataWriter(path, schema, conf, s"crash-$pid")
        chunk.foreach { case (id, v) =>
          w.write(InternalRow.fromSeq(Seq(id, v)))
        }
        val m = w.commit().asInstanceOf[KvCommitMessage]
        KvStore.StagedSeg(m.stagedFile, m.statsJson, m.bloomFile)
      }.toSeq

  /** one epoch append through the real two-phase commit */
  private def append(path: String, tag: String, rows: Seq[(Long, Long)],
      parts: Int = 2): Unit =
    KvStore.commitEpochSegs(conf, path, schema, tag, stage(path, rows, parts))

  private def upsert(path: String, tag: String, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    KvStore.upsert(spark, path, rows.toDF("id", "v"), Seq("id"),
      tag = Some(tag))
  }

  /** visible state as a map; empty store (no schema yet) reads empty */
  private def readState(path: String): Map[Long, Long] =
    if (KvStore.readSchema(conf, path).isEmpty) Map.empty
    else KvStore.readCurrent(spark, path, Seq("id"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** first-write-wins fold of an append into the model */
  private def modelAppend(m: Map[Long, Long], rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.foldLeft(m) { case (acc, (k, v)) =>
      if (acc.contains(k)) acc else acc.updated(k, v)
    }

  /** every file on disk must be accounted for after vacuum */
  private def assertNoOrphans(path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val manifest = KvStore.readManifest(conf, path)
    val listedSegs = manifest.flatMap(_.segments).toSet
    val listedDvs = manifest.flatMap(_.segs.flatMap(_.dv)).toSet
    val listedBlooms = manifest.flatMap(_.segs.flatMap(_.bloom)).toSet
    def names(dir: org.apache.hadoop.fs.Path): Set[String] =
      if (!fs.exists(dir)) Set.empty
      else fs.listStatus(dir).filter(_.isFile).map(_.getPath.getName).toSet
    val segOrphans = names(KvStore.segmentsDir(path)) -- listedSegs
    assert(segOrphans.isEmpty, s"segment orphans survive vacuum: $segOrphans")
    val stagingLeft = names(KvStore.stagingDir(path))
    assert(stagingLeft.isEmpty, s"staging leftovers survive vacuum: $stagingLeft")
    val dvOrphans = names(KvDv.dvsDir(path)) -- listedDvs
    assert(dvOrphans.isEmpty, s"dv orphans survive vacuum: $dvOrphans")
    val bloomOrphans = names(KvBloom.bloomsDir(path)) -- listedBlooms
    assert(bloomOrphans.isEmpty, s"bloom orphans survive vacuum: $bloomOrphans")
    val tmpLeft = names(KvStore.commitsDir(path)).filter(_.startsWith("."))
    assert(tmpLeft.isEmpty, s"manifest tmps survive vacuum: $tmpLeft")
  }

  /** arm `point`, run `op` expecting the injected crash, check the state
   * contract, retry via `retry`, vacuum, re-check. */
  private def crashCase(path: String, point: String, postCas: Boolean,
      pre: Map[Long, Long], post: Map[Long, Long])(
      op: => Unit)(retry: => Unit): Unit = {
    Failpoints.reset() // clear fire history so hasFired below witnesses
    // THIS case's injection (points repeat across sweep iterations)
    Failpoints.arm(point)
    val failed =
      try { op; false }
      catch { case _: Throwable => true }
    finally Failpoints.disarmAll()
    assert(failed, s"$point: op completed without the injected crash")
    assert(Failpoints.hasFired(point), s"$point never fired — hook moved?")
    val crashState = readState(path)
    if (postCas)
      assert(crashState === post, s"$point: crash after CAS must show post-op state")
    else
      assert(crashState === pre, s"$point: crash before CAS must leave pre-op state")
    retry
    assert(readState(path) === post, s"$point: retry did not converge")
    Thread.sleep(30) // vacuum's age guard is wall-clock; files were just written
    KvStore.vacuum(path, graceMs = 1L)
    assert(readState(path) === post, s"$point: vacuum changed visible state")
    assertNoOrphans(path)
  }

  // ---- two-phase epoch commit (append) ----

  private val appendPoints = Seq(
    "commit:begin" -> false,
    "commit:after-schema" -> false,
    "publish:mid" -> false,
    "commit:after-publish" -> false,
    "manifest:after-tmp" -> false,
    "manifest:after-cas" -> true,
    "commit:after-cas" -> true)

  for ((point, postCas) <- appendPoints)
    test(s"append crash at $point") {
      val path = freshDir()
      append(path, "e1", Seq(1L -> 10L, 2L -> 20L))
      val pre = Map(1L -> 10L, 2L -> 20L)
      val rows2 = Seq(2L -> 99L, 3L -> 30L, 4L -> 40L) // 2 shadowed by e1
      val post = modelAppend(pre, rows2)
      crashCase(path, point, postCas, pre, post) {
        append(path, "e2", rows2)
      } {
        append(path, "e2", rows2) // same tag: absorbs if committed
      }
    }

  test("append crash at writeatomic:after-tmp (first-write schema persist)") {
    val path = freshDir()
    val rows = Seq(1L -> 10L, 2L -> 20L)
    // stage OUTSIDE the armed window: the bloom side-file staging also
    // rides writeAtomic (inside a deliberate failure-tolerant try) and
    // would consume the one-shot point before the schema persist reaches it
    val staged = stage(path, rows, parts = 2)
    crashCase(path, "writeatomic:after-tmp", postCas = false,
      pre = Map.empty, post = rows.toMap) {
      KvStore.commitEpochSegs(conf, path, schema, "e1", staged)
    } {
      append(path, "e1", rows) // a crashed writer restages from scratch
    }
  }

  // ---- atomic upsert (dv swap + new epoch in one CAS) ----

  private val upsertPoints = Seq(
    "upsert:after-keys" -> false,
    "upsert:after-stage" -> false,
    "upsert:after-publish" -> false,
    "upsert:after-dv-write" -> false,
    "upsert:after-cas" -> true)

  for ((point, postCas) <- upsertPoints)
    test(s"upsert crash at $point") {
      val path = freshDir()
      append(path, "e1", Seq(1L -> 10L, 2L -> 20L, 3L -> 30L))
      val pre = Map(1L -> 10L, 2L -> 20L, 3L -> 30L)
      val up = Seq(2L -> 222L, 4L -> 444L) // replace 2, insert 4
      val post = pre ++ up
      crashCase(path, point, postCas, pre, post) {
        upsert(path, "u1", up)
      } {
        upsert(path, "u1", up) // same tag: absorbs if committed
      }
    }

  // ---- clustered compaction ----

  private val compactPoints = Seq(
    "compact:after-stage" -> false,
    "compact:after-publish" -> false,
    "compact:after-cas" -> true,
    "compact:mid-delete" -> true)

  for ((point, postCas) <- compactPoints)
    test(s"compact crash at $point") {
      val path = freshDir()
      append(path, "e1", Seq(1L -> 10L, 2L -> 20L))
      append(path, "e2", Seq(2L -> 99L, 3L -> 30L))
      append(path, "e3", Seq(4L -> 40L))
      val state = Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L)
      crashCase(path, point, postCas, state, state) {
        KvStore.compact(spark, path, Seq("id"), clusterByKey = true)
      } {
        KvStore.compact(spark, path, Seq("id"), clusterByKey = true)
      }
    }

  // ---- retention fold ----

  private val expirePoints = Seq(
    "expire:after-stage" -> false,
    "expire:after-publish" -> false,
    "expire:after-cas" -> true)

  for ((point, postCas) <- expirePoints)
    test(s"retention fold crash at $point") {
      val path = freshDir()
      append(path, "e1", Seq(1L -> 10L))
      append(path, "e2", Seq(1L -> 99L, 2L -> 20L))
      append(path, "e3", Seq(3L -> 30L))
      append(path, "e4", Seq(4L -> 40L))
      val state = Map(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L)
      crashCase(path, point, postCas, state, state) {
        KvStore.expireEpochs(spark, path, Seq("id"), keepLast = 1)
      } {
        KvStore.expireEpochs(spark, path, Seq("id"), keepLast = 1)
      }
    }

  // ---- SQL row-level DML (delta write: dv swap + insert epoch) ----

  private var catN = 0
  private def freshSqlTable(rows: Seq[(Long, Long)]): (String, String) = {
    catN += 1
    val cat = s"kvcrash$catN"
    val wh = Files.createTempDirectory(s"graft_crash_sql_${catN}_").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sinks.v2.GraftKvCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    import spark.implicits._
    rows.toDF("id", "v").createOrReplaceTempView(s"crash_src_$catN")
    spark.sql(s"CREATE TABLE $cat.ns.t AS SELECT * FROM crash_src_$catN")
    (s"$cat.ns.t", s"$wh/ns/t")
  }

  private val rowLevelPoints = Seq(
    "rowlevel:after-publish" -> false,
    "rowlevel:after-dv" -> false,
    "rowlevel:after-cas" -> true)

  for ((point, postCas) <- rowLevelPoints)
    test(s"SQL DELETE crash at $point") {
      val rows = Seq(1L -> 10L, 2L -> 20L, 3L -> 30L, 4L -> 40L)
      val (tbl, path) = freshSqlTable(rows)
      val pre = rows.toMap
      // v % 20 != 0 is not in the scan's pushable set → WriteDelta path
      val post = pre.filter { case (_, v) => v % 20 == 0 }
      crashCase(path, point, postCas, pre, post) {
        spark.sql(s"DELETE FROM $tbl WHERE v % 20 != 0")
      } {
        spark.sql(s"DELETE FROM $tbl WHERE v % 20 != 0") // idempotent by predicate
      }
    }

  // ---- seeded random crash sweep: ops × points, model-checked ----

  test("seeded crash sweep: random ops with random injected crashes converge to the model") {
    val seeds = Seq(17L, 43L) ++ sys.env.get("SPARK_GRAFT_CRASH_SEEDS")
      .toSeq.flatMap(_.split(",").map(_.trim.toLong))
    for (seed <- seeds) {
      val rng = new scala.util.Random(seed)
      val path = freshDir()
      var model = Map.empty[Long, Long]
      var nextKey = 1L
      val opPoints = Map(
        "append" -> appendPoints,
        "upsert" -> upsertPoints,
        "compact" -> compactPoints,
        "expire" -> expirePoints)
      for (step <- 1 to 24) {
        val op = rng.shuffle(Seq("append", "append", "upsert", "upsert",
          "compact", "expire")).head
        // new keys + overwrites of a random existing key
        val fresh = (0 until (1 + rng.nextInt(3))).map { _ =>
          val k = nextKey; nextKey += 1; k -> rng.nextLong(1000L)
        }
        val overlap =
          if (model.isEmpty) Nil
          else Seq(model.keys.toSeq(rng.nextInt(model.size)) -> rng.nextLong(1000L))
        val rows = rng.shuffle(fresh ++ overlap)
        val tag = s"sweep:$seed:$step"
        def run(): Unit = op match {
          case "append" => append(path, tag, rows)
          case "upsert" =>
            if (model.isEmpty) append(path, tag, rows) else upsert(path, tag, rows)
          case "compact" =>
            KvStore.compact(spark, path, Seq("id"), clusterByKey = rng.nextBoolean())
          case "expire" => KvStore.expireEpochs(spark, path, Seq("id"), keepLast = 2)
        }
        val effectiveOp =
          if (op == "upsert" && model.isEmpty) "append" else op
        model = effectiveOp match {
          case "append" => modelAppend(model, rows)
          case "upsert" => model ++ rows
          case _ => model
        }
        // ~60% of steps crash at a random point of the op's own protocol
        if (rng.nextInt(10) < 6 && !(effectiveOp != op)) {
          val (point, _) = opPoints(op)(rng.nextInt(opPoints(op).size))
          Failpoints.disarmAll()
          Failpoints.arm(point)
          try run()
          catch { case _: Throwable => () } // crashed mid-op (or op was a no-op and never hit it)
          finally Failpoints.disarmAll()
          run() // the retry — same tag, must converge without double-commit
        } else run()
        assert(readState(path) === model,
          s"seed=$seed step=$step op=$op: state diverged from model")
      }
      Thread.sleep(30)
      KvStore.vacuum(path, graceMs = 1L)
      assert(readState(path) === model, s"seed=$seed: vacuum changed state")
      assertNoOrphans(path)
    }
  }

  // ---- concurrent crash sweep: crashes × OCC concurrency composed ----

  test("concurrent crash sweep: two writers, one crash-armed per step — OCC liveness, convergence, watermarks") {
    // Each step runs a SURVIVOR (streaming append, commit:* protocol) and
    // a CRASHER (tagged streaming upsert, upsert:* protocol) on two
    // threads against one store, with a random upsert-only point armed —
    // the protocols' failpoint sets are disjoint, so the injection always
    // kills the crasher and never the survivor. Asserted each step:
    //  - OCC LIVENESS: the survivor's append commits even while the
    //    crasher dies mid-protocol (its CAS loop absorbs the conflict);
    //  - CONVERGENCE: the crasher's retry (same stream-upsert tag) lands
    //    exactly once — mid-crash state is one of the two legal snapshots
    //    (upsert absent, or upsert committed when the CAS preceded death);
    //  - WATERMARKS: after retention folds, replays of folded append AND
    //    upsert batches — with poisoned row values, so a double-commit
    //    cannot hide — are absorbed by the per-writer watermarks.
    // Keys are namespaced per writer and per op so concurrent ops commute
    // and the model is interleaving-independent.
    val seeds = Seq(7L, 21L, 63L) ++ sys.env.get("SPARK_GRAFT_CRASH_SEEDS")
      .toSeq.flatMap(_.split(",").map(_.trim.toLong))
    val crasherPoints = upsertPoints // upsert:* only — disjoint from commit:*
    for (seed <- seeds) {
      val rng = new scala.util.Random(seed)
      val path = freshDir()
      append(path, "batch:seed", Seq(900000L -> 0L)) // upserts never first-write
      var model = Map(900000L -> 0L)
      val writers = Seq("wa", "wb")
      val nextAppend = scala.collection.mutable.Map("wa" -> 0L, "wb" -> 0L)
      val nextUpsert = scala.collection.mutable.Map("wa" -> 0L, "wb" -> 0L)
      val appendHist = scala.collection.mutable.Map.empty[(String, Long), Seq[(Long, Long)]]
      val upsertHist = scala.collection.mutable.Map.empty[(String, Long), Seq[(Long, Long)]]
      val owned = Map("wa" -> scala.collection.mutable.ArrayBuffer.empty[Long],
        "wb" -> scala.collection.mutable.ArrayBuffer.empty[Long])
      var nextKey = Map("wa" -> 1000L, "wb" -> 2000000L)

      def freshKeys(w: String, n: Int): Seq[Long] = {
        val base = nextKey(w)
        nextKey = nextKey.updated(w, base + n)
        val ks = (0 until n).map(base + _)
        owned(w) ++= ks
        ks
      }

      for (step <- 1 to 15) {
        val crasher = writers(rng.nextInt(2))
        val survivor = if (crasher == "wa") "wb" else "wa"
        // survivor: in-order streaming append of fresh keys
        val ab = nextAppend(survivor)
        val appendRows = freshKeys(survivor, 1 + rng.nextInt(3)).map(_ -> rng.nextLong(1000L))
        appendHist((survivor, ab)) = appendRows
        nextAppend(survivor) = ab + 1
        // crasher: in-order streaming upsert replacing a sample of its OWN
        // keys plus inserting fresh ones
        val ub = nextUpsert(crasher)
        val replace = rng.shuffle(owned(crasher).toSeq).take(rng.nextInt(3))
          .map(_ -> (10000L + rng.nextLong(1000L)))
        val insert = freshKeys(crasher, 1).map(_ -> rng.nextLong(1000L))
        val upsertRows = rng.shuffle(replace ++ insert)
        upsertHist((crasher, ub)) = upsertRows
        nextUpsert(crasher) = ub + 1

        val (point, _) = crasherPoints(rng.nextInt(crasherPoints.size))
        Failpoints.reset() // points repeat across steps — hasFired below
        // must witness this step's own firing, not a sticky earlier one
        Failpoints.arm(point)
        var survivorErr: Option[Throwable] = None
        val t1 = new Thread(() =>
          try append(path, s"stream:$survivor:$ab", appendRows)
          catch { case e: Throwable => survivorErr = Some(e) })
        val t2 = new Thread(() =>
          try upsert(path, s"stream-upsert:$crasher:$ub", upsertRows)
          catch { case _: Throwable => () }) // expected: the injected crash
        t1.start(); t2.start(); t1.join(); t2.join()
        Failpoints.disarmAll()
        assert(Failpoints.hasFired(point), s"seed=$seed step=$step: $point never fired")
        assert(survivorErr.isEmpty,
          s"seed=$seed step=$step: survivor append died under the crasher: $survivorErr")

        // OCC liveness: the survivor's epoch committed despite the
        // concurrent death; the mid-crash state is one of the two legal
        // snapshots (the upsert is atomic — all or nothing)
        model = modelAppend(model, appendRows)
        val withUpsert = model ++ upsertRows
        val mid = readState(path)
        assert(mid === model || mid === withUpsert,
          s"seed=$seed step=$step point=$point: mid-crash state is neither legal snapshot")

        // convergence: the crasher's replayed batch (same tag) lands once
        upsert(path, s"stream-upsert:$crasher:$ub", upsertRows)
        model = withUpsert
        assert(readState(path) === model,
          s"seed=$seed step=$step point=$point: retry did not converge")

        if (rng.nextInt(10) < 4) {
          KvStore.expireEpochs(spark, path, Seq("id"), keepLast = 1 + rng.nextInt(2))
          assert(readState(path) === model, s"seed=$seed step=$step: fold changed state")
          // watermark correctness: replay a random OLD batch of each kind
          // with POISONED values — absorption means the poison never lands
          if (appendHist.nonEmpty) {
            val (w, b) = appendHist.keys.toSeq(rng.nextInt(appendHist.size))
            append(path, s"stream:$w:$b", appendHist((w, b)).map { case (k, _) => k -> 666666L })
            assert(readState(path) === model,
              s"seed=$seed step=$step: folded append replay was not absorbed")
          }
          if (upsertHist.nonEmpty) {
            val (w, b) = upsertHist.keys.toSeq(rng.nextInt(upsertHist.size))
            upsert(path, s"stream-upsert:$w:$b", upsertHist((w, b)).map { case (k, _) => k -> 777777L })
            assert(readState(path) === model,
              s"seed=$seed step=$step: folded upsert replay was not absorbed")
          }
        }
      }
      Thread.sleep(30)
      KvStore.vacuum(path, graceMs = 1L)
      assert(readState(path) === model, s"seed=$seed: vacuum changed state")
      assertNoOrphans(path)
    }
  }
}
