package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names (local subset checks)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // adversarial-partitioning runs decouple the shuffle fan-out from the
    // core count (e.g. SPARK_GRAFT_SHUFFLE=7 on local[3]) to flush any
    // partition-count/order dependence the symmetric default masks
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // SPARK_GRAFT_MASTER=local-cluster[2,8,4096]: multi-JVM executor axis —
    // the whole catalog with every closure/broadcast/commit-message crossing
    // a real process boundary (see ClusterMode)
    val builder = ClusterMode.configure(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // catalog buffers are small bounded sets → safe to keep grouped
      // collects hash-based to 2²² keys/task (see GraftExtensions.register)
      .config("spark.graft.objectHashFallbackThreshold", (1 << 22).toString)
    // SPARK_GRAFT_NO_CODEGEN=1: run the whole catalog with codegen OFF —
    // every custom expression takes its interpreted eval() path instead of
    // doGenCode(), so a hash-clean run proves eval ≡ codegen catalog-wide
    // (the per-expression parity specs only pin hand-picked inputs). Also
    // what executors actually do whenever Janino falls back at scale.
    if (sys.env.get("SPARK_GRAFT_NO_CODEGEN").exists(_ == "1")) {
      builder.config("spark.sql.codegen.wholeStage", "false")
        .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    }
    // SPARK_GRAFT_SPECULATION=1: speculate EVERY task immediately
    // (multiplier 1.0, quantile 0.0) — maximal duplicate-task pressure.
    // On a real cluster stragglers get cloned routinely, so every task in
    // the engine (DSv2 writers above all) must tolerate a concurrent twin:
    // the commit coordinator authorizes exactly one, the loser's output
    // must abort cleanly, and side-effect-free tasks must be idempotent.
    // Meaningful mainly with SPARK_GRAFT_MASTER=local-cluster[...] where the
    // twin runs in a DIFFERENT JVM.
    // SPARK_GRAFT_NO_AQE=1: adaptive execution fully off — every plan runs
    // exactly as compiled (no runtime coalescing/skew-split/join demotion),
    // so a hash-clean run proves no operator leans on AQE replanning for
    // correctness, and the static partitioning choices stand on their own.
    if (sys.env.get("SPARK_GRAFT_NO_AQE").exists(_ == "1"))
      builder.config("spark.sql.adaptive.enabled", "false")
    // SPARK_GRAFT_KRYO=1: swap the closure/shuffle/broadcast serializer for
    // Kryo (what most production clusters run) — flushes any class in the
    // engine that only round-trips under Java serialization.
    if (sys.env.get("SPARK_GRAFT_KRYO").exists(_ == "1"))
      builder.config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
    if (sys.env.get("SPARK_GRAFT_SPECULATION").exists(_ == "1")) {
      builder.config("spark.speculation", "true")
        .config("spark.speculation.multiplier", "1.0")
        .config("spark.speculation.quantile", "0.0")
        .config("spark.speculation.interval", "20ms")
        .config("spark.speculation.minTaskRuntime", "0ms")
    }
    val spark = builder.getOrCreate()
    // SPARK_GRAFT_LOG=INFO: e.g. to confirm the speculation axis actually
    // launches task twins (TaskSetManager logs them at INFO)
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    GraftExtensions.register(spark) // engine-on config: functions + optimizer rules
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache() // per-query persist barriers
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
