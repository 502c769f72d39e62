package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM (Test/fork := true). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: maxFailures=2 — task retry ON, as on any real cluster
      // (plain local[4] aborts the job on the first task failure, which
      // would make executor-side retry paths untestable; a deterministic
      // task bug still fails the job — it just fails twice)
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftExtensions.register(s) // engine-on config: functions + optimizer rules
    s
  }
}
