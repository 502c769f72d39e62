package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the master-resolution rules behind the multi-JVM executor
  * axis (the local-cluster catalog/streaming runs themselves are driven via
  * `tools/run.sh` — see SCALING.md "multi-JVM executor axis"). */
class ClusterModeSpec extends AnyFunSuite {

  test("default master is local[cpus] with no extra confs") {
    val (master, confs) = ClusterMode.plan("7", Map.empty)
    assert(master == "local[7]")
    assert(confs.isEmpty)
  }

  test("SPARK_GRAFT_MASTER override wins; plain masters add nothing") {
    val (master, confs) =
      ClusterMode.plan("7", Map("SPARK_GRAFT_MASTER" -> "local[2]"))
    assert(master == "local[2]")
    assert(confs.isEmpty)
  }

  test("local-cluster master ships classes AND resources to executors") {
    val (master, confs) =
      ClusterMode.plan("7", Map("SPARK_GRAFT_MASTER" -> "local-cluster[2,4,3072]"))
    assert(master == "local-cluster[2,4,3072]")
    val cp = confs.toMap.getOrElse("spark.executor.extraClassPath", "")
    // both halves must be absolute: the executor JVM's cwd is the worker's
    // scratch dir, not the repo root
    val parts = cp.split(":")
    assert(parts.exists(_.endsWith("target/scala-2.13/classes")), cp)
    // META-INF/services DSv2 registration (graft-kv / graft-logs) lives in
    // resources, which `sbt compile` does not copy into the classes dir
    assert(parts.exists(_.endsWith("src/main/resources")), cp)
    assert(parts.forall(_.startsWith("/")), cp)
  }

  test("local-cluster bracket memory becomes the executor heap") {
    val (_, confs) =
      ClusterMode.plan("7", Map("SPARK_GRAFT_MASTER" -> "local-cluster[2, 8, 6144]"))
    // one executor per worker: the worker's memory grant IS the heap —
    // without this, spark.executor.memory stays 1g inside a 6g worker
    assert(confs.toMap.get("spark.executor.memory").contains("6144m"))
  }

  test("SPARK_GRAFT_EXEC_CP overrides the executor classpath verbatim") {
    val (_, confs) = ClusterMode.plan(
      "7",
      Map("SPARK_GRAFT_MASTER" -> "local-cluster[1,1,1024]",
          "SPARK_GRAFT_EXEC_CP" -> "/elsewhere/classes"))
    assert(confs.toMap.apply("spark.executor.extraClassPath") == "/elsewhere/classes")
  }
}
