package graft

import org.apache.spark.sql.SparkSession

/** Master resolution for the driver-contract mains.
  *
  * `SPARK_GRAFT_MASTER` overrides the default `local[cpus]`. Its main use is
  * `local-cluster[W,C,M]` — Spark's standalone-in-miniature: W worker
  * endpoints each launching a real `CoarseGrainedExecutorBackend` PROCESS
  * with M MB of heap. Unlike `local[n]` (tasks run inside the driver JVM),
  * this exercises the actual cluster surfaces: every task closure, broadcast
  * value, custom Expression, Aggregator buffer and DSv2 commit message
  * crosses a process boundary through real serialization, and nothing can
  * accidentally lean on driver-JVM singletons or the shared block manager.
  * Running the gate catalog under it is the closest single-machine rehearsal
  * of the multi-executor deployment the engine is designed for.
  *
  * local-cluster needs two things the local master doesn't:
  *  - SPARK_HOME in the environment (the worker builds each executor's java
  *    command from the distribution's launcher; `tools/run.sh` exports it,
  *    along with SPARK_SCALA_VERSION which load-spark-env.sh normally sets);
  *  - the graft classes on the EXECUTOR classpath — the driver's classpath
  *    is not inherited across the process boundary, so the compiled-classes
  *    and resources dirs (META-INF/services DSv2 registration lives in the
  *    latter) are passed via `spark.executor.extraClassPath`
  *    (override with SPARK_GRAFT_EXEC_CP when running from another cwd).
  */
object ClusterMode {

  /** Pure planning step: (master, extra confs) from the environment —
    * separated from the builder so the resolution rules are unit-testable. */
  def plan(cpus: String,
           env: Map[String, String] = sys.env): (String, Seq[(String, String)]) = {
    val master = env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val confs =
      if (!master.startsWith("local-cluster")) Nil
      else {
        val cp = env.getOrElse(
          "SPARK_GRAFT_EXEC_CP",
          Seq("target/scala-2.13/classes", "src/main/resources")
            .map(new java.io.File(_).getAbsolutePath).mkString(":"))
        // the bracket's M is the WORKER's memory grant; spark.executor.memory
        // stays at its 1g default unless set, silently wasting the grant (the
        // sf1 isolated-driver run OOMed two queries on 1 GiB executors inside
        // 6 GiB workers before this). One executor per worker here, so grant
        // == heap.
        val mem = "local-cluster\\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*(\\d+)\\s*\\]".r
          .findFirstMatchIn(master).map(_.group(1))
        Seq("spark.executor.extraClassPath" -> cp) ++
          mem.map(m => "spark.executor.memory" -> s"${m}m")
      }
    (master, confs)
  }

  /** Set the resolved master on `b`, plus the executor classpath when the
    * master launches separate executor JVMs. */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    val (master, confs) = plan(cpus)
    b.master(master)
    confs.foreach { case (k, v) => b.config(k, v) }
    b
  }
}
