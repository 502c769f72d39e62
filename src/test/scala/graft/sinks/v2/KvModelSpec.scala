package graft.sinks.v2

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions.{col, concat, lit}
import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Model-based differential test: a random sequence of store operations
 * (append / upsert / update / range DELETE / compact / clustered compact /
 * expireEpochs / vacuum) is mirrored against a plain in-memory Map with
 * the store's documented semantics, and `readCurrent` must equal the
 * model after EVERY step. Single-feature specs pin each operation alone;
 * this pins their INTERACTIONS — dv chains folded by retention, upserts
 * over compacted bases, clustering under live tombstones — the places
 * storage engines actually break. Deterministic seeds: failures replay.
 */
class KvModelSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private def conf = spark.sessionState.newHadoopConf()

  private def runModel(seed: Long, steps: Int): Unit = {
    val rnd = new Random(seed)
    val p = Files.createTempDirectory(s"graft_kvmodel_${seed}_").toString + "/store"
    val model = scala.collection.mutable.Map.empty[Long, String]
    val keySpace = 40L

    def distinctBatch(n: Int): Seq[(Long, String)] = {
      val keys = rnd.shuffle((0L until keySpace).toList).take(n)
      keys.map(k => (k, s"v${rnd.nextInt(1000)}"))
    }

    def check(step: Int, op: String): Unit = {
      val got =
        if (KvStore.readSchema(conf, p).isEmpty) Map.empty[Long, String]
        else KvStore.readCurrent(spark, p, Seq("k")).collect()
          .map(r => r.getLong(r.fieldIndex("k")) -> r.getString(r.fieldIndex("v")))
          .toMap
      assert(got === model.toMap,
        s"seed=$seed step=$step after $op:\n  store=$got\n  model=$model")
    }

    (1 to steps).foreach { step =>
      val op = rnd.nextInt(10)
      val label = op match {
        case 0 | 1 => // append: first-write-wins — only absent keys land
          val batch = distinctBatch(1 + rnd.nextInt(6))
          batch.toDF("k", "v").coalesce(1)
            .write.format("graft-kv").option("path", p).mode("append").save()
          batch.foreach { case (k, v) =>
            if (!model.contains(k)) model(k) = v
          }
          s"append($batch)"
        case 2 | 3 => // upsert: replace-or-insert
          val batch = distinctBatch(1 + rnd.nextInt(6))
          KvStore.upsert(spark, p, batch.toDF("k", "v"), Seq("k"))
          batch.foreach { case (k, v) => model(k) = v }
          s"upsert($batch)"
        case 4 => // update: suffix matched values
          if (KvStore.readSchema(conf, p).isDefined) {
            val lo = rnd.nextLong(keySpace)
            KvStore.update(spark, p, Seq("k"), col("k") >= lo,
              Map("v" -> concat(col("v"), lit("+"))))
            model.keys.filter(_ >= lo).toSeq.foreach(k => model(k) = model(k) + "+")
            s"update(k>=$lo)"
          } else "update(skip)"
        case 5 => // range DELETE through the catalog two-tier path
          if (KvStore.readSchema(conf, p).isDefined) {
            val lo = rnd.nextLong(keySpace)
            val hi = lo + rnd.nextLong(keySpace - lo + 1)
            KvCatalogTable.deleteRows(spark, p,
              KvStore.readSchema(conf, p).get,
              Array(GreaterThanOrEqual("k", lo), LessThanOrEqual("k", hi)), p)
            (lo to hi).foreach(model.remove)
            s"delete($lo..$hi)"
          } else "delete(skip)"
        case 6 => // compact (materializes dvs, folds epochs)
          KvStore.compact(spark, p, Seq("k"))
          "compact"
        case 7 => // clustered compact
          if (KvStore.readSchema(conf, p).isDefined) {
            KvStore.compact(spark, p, Seq("k"), clusterByKey = true,
              numSegments = Some(1 + rnd.nextInt(4)))
            "compact(cluster)"
          } else "compact(skip)"
        case 8 => // retention fold
          if (KvStore.readSchema(conf, p).isDefined) {
            KvStore.expireEpochs(spark, p, Seq("k"), keepLast = 1 + rnd.nextInt(3))
            "expireEpochs"
          } else "expire(skip)"
        case 9 =>
          KvStore.vacuum(p, graceMs = 0L)
          "vacuum"
      }
      check(step, label)
    }
    // final structural sanity: the store reloads from disk alone
    if (KvStore.readSchema(conf, p).isDefined) {
      val epochs = KvStore.readManifest(conf, p)
      assert(epochs.map(_.epoch) === epochs.map(_.epoch).sorted, "epoch order")
      assert(epochs.map(_.tag).distinct.length === epochs.length, "tag uniqueness")
    }
  }

  test("random op sequence, seed 1: store == model after every step") {
    runModel(seed = 1L, steps = 30)
  }

  test("random op sequence, seed 42: store == model after every step") {
    runModel(seed = 42L, steps = 30)
  }

  test("random op sequence, seed 2026: store == model after every step") {
    runModel(seed = 2026L, steps = 30)
  }

  // exploratory sweeps: SPARK_GRAFT_MODEL_SEEDS=7,8,9 widens the hunt
  // (and SPARK_GRAFT_MODEL_STEPS lengthens the horizon — deeper dv
  // chains, more fold/cluster interleavings) without bloating the
  // committed suite's runtime
  private val envSteps =
    sys.env.get("SPARK_GRAFT_MODEL_STEPS").map(_.toInt).getOrElse(30)
  sys.env.get("SPARK_GRAFT_MODEL_SEEDS").toSeq
    .flatMap(_.split(",")).map(_.trim.toLong).foreach { s =>
      test(s"random op sequence, env seed $s ($envSteps steps)") {
        runModel(seed = s, steps = envSteps)
      }
    }
}
