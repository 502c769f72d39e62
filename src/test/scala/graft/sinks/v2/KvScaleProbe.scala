package graft.sinks.v2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In}

/**
 * Micro-measurement main for the kv store's at-scale paths (not a spec —
 * wall-clock numbers for SCALING.md): interleaved-epoch build, bloom-pruned
 * point planning, point upsert, clustered compaction. Run via
 * `tools/run.sh graft.sinks.v2.KvScaleProbe` with test-classes on the CP.
 */
object KvScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val conf = spark.sessionState.newHadoopConf()
    val epochs = args.headOption.map(_.toInt).getOrElse(20)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(50000)
    val p = java.nio.file.Files.createTempDirectory("kv_scale_").toString + "/store"
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"$label%-48s ${(System.nanoTime() - s) / 1e9}%8.3f s"); r
    }
    t(s"build: $epochs epochs x $rowsPer rows") {
      (0 until epochs).foreach { e =>
        spark.range(0, rowsPer.toLong)
          .selectExpr(s"id * $epochs + $e as k", "concat('v', id) as v")
          .coalesce(1).write.format("graft-kv").option("path", p)
          .mode("append").save()
      }
    }
    def parts(fs: org.apache.spark.sql.sources.Filter*): Int =
      new KvScan(p, conf, filters = fs.toSeq).toBatch.planInputPartitions().length
    println("segments total: " + KvStore.readManifest(conf, p).map(_.segs.size).sum)
    t("plan: point lookup (bloom cold)") {
      println("  -> partitions: " + parts(EqualTo("k", (epochs * 20 + 3).toLong)))
    }
    t("plan: point lookup (bloom warm)") {
      println("  -> partitions: " + parts(EqualTo("k", (epochs * 40 + 7).toLong)))
    }
    t("plan: 100-key IN, one residue class") {
      println("  -> partitions: " +
        parts(In("k", Array.tabulate(100)(i => (i.toLong * 2 * epochs + 3): Any))))
    }
    val src = spark.range(0, 100)
      .selectExpr(s"id * 2 * $epochs + 3 as k", "'upd' as v")
    t(s"upsert: 100 keys into ${epochs.toLong * rowsPer}-row store") {
      KvStore.upsert(spark, p, src, Seq("k"))
    }
    println("segments with dv after upsert: " +
      KvStore.readManifest(conf, p).flatMap(_.segs).count(_.dv.isDefined))
    t("compact: clusterByKey, 16 segments") {
      KvStore.compact(spark, p, Seq("k"), clusterByKey = true,
        numSegments = Some(16))
    }
    println("post-cluster segments: " +
      KvStore.readManifest(conf, p).map(_.segs.size).sum)
    t("plan: point lookup post-cluster") {
      println("  -> partitions: " + parts(EqualTo("k", (epochs * 20 + 3).toLong)))
    }
    t("readCurrent count post-everything") {
      println("  -> " + KvStore.readCurrent(spark, p, Seq("k")).count())
    }
    t("read: upserted value is visible") {
      println("  -> " + KvStore.readCurrent(spark, p, Seq("k"))
        .filter(col("k") === 3L).select("v").collect().map(_.getString(0)).mkString)
    }
  }
}
