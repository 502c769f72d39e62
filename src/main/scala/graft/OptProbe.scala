package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Optimization probe: run ONE catalog query (warm, repeated) under a
 * job/stage listener and print a per-job / per-stage time breakdown —
 * the local[n] stand-in for the Spark UI's stage table (the UI is off in
 * the bench harness). Usage:
 *
 *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.OptProbe <query> [reps]
 *
 * Prints, for the LAST rep (warm: codegen caches hot, artifact caches
 * built): every job with its duration, description and stage breakdown
 * (task time sum + peak task count), so fixed scheduling overhead is
 * distinguishable from real compute.
 */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.objectHashFallbackThreshold", (1 << 22).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(spark)

    case class JobRec(id: Int, desc: String, var start: Long = 0L, var end: Long = 0L,
        stages: scala.collection.mutable.ArrayBuffer[(Int, String, Long, Int, Long)] =
          scala.collection.mutable.ArrayBuffer.empty)
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = scala.collection.mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        val j = JobRec(js.jobId, desc, js.time)
        jobs(js.jobId) = j
        js.stageIds.foreach(s => stageToJob(s) = js.jobId)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = sc.stageInfo
        val dur = (for { s <- si.submissionTime; e <- si.completionTime } yield e - s).getOrElse(-1L)
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach(_.stages +=
          ((si.stageId, si.name.takeWhile(_ != '\n'), dur, si.numTasks,
            si.taskMetrics.executorRunTime)))
      }
    }

    val fn = SparkEntry.queries(name)
    (1 until reps).foreach { _ =>  // warm reps, unlistened
      fn(spark, sfDir).count(); spark.catalog.clearCache()
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    Thread.sleep(500) // let listener events drain
    println(f"\n=== $name: warm rep wall=$wall%.3f s, rows=$n ===")
    var covered = 0L
    jobs.values.foreach { j =>
      val jdur = (j.end - j.start) / 1e3
      covered += (j.end - j.start)
      println(f"job ${j.id}%3d ${jdur}%8.3f s  ${j.desc.take(80)}")
      j.stages.sortBy(_._1).foreach { case (sid, sname, dur, ntasks, runMs) =>
        println(f"    stage $sid%3d ${dur / 1e3}%8.3f s  tasks=$ntasks%3d taskTime=${runMs / 1e3}%7.3f s  ${sname.take(70)}")
      }
    }
    println(f"jobs total ${covered / 1e3}%.3f s of $wall%.3f s wall (gap = driver/planning)")
    spark.stop()
  }
}
