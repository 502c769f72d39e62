package graft.sinks.v2

import org.scalatest.funsuite.AnyFunSuite

/**
 * The DELETE OCC re-check (in-package to reach the private[v2] helpers):
 * `deleteRows` scans a snapshot, builds deletion vectors outside the
 * commit, then CAS-commits under [[KvCatalogTable.deleteConflict]] — which
 * must flag (a) a concurrently appended segment the predicate might match
 * (rows the DELETE never evaluated — the Delta ConcurrentAppendException
 * shape) and (b) a concurrent DELETE's deletion-vector swap (whose union
 * this commit would clobber). This spec drives the conflict predicate
 * directly against the exact manifest states involved, then the
 * merge-on-read path end to end.
 */
class KvDeleteRaceSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("deleteConflict flags concurrent appends and dv swaps; dv delete lands end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kvrace_").toString
    spark.conf.set("spark.sql.catalog.kvrace", "graft.sinks.v2.GraftKvCatalog")
    spark.conf.set("spark.sql.catalog.kvrace.warehouse", dir)
    spark.sql("CREATE TABLE kvrace.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO kvrace.ns.t SELECT id, concat('a', id) FROM range(0, 10, 1, 1)")
    val path = s"$dir/ns/t"
    val conf = spark.sessionState.newHadoopConf()
    val schema = KvStore.readSchema(conf, path).get
    val snapshot = KvStore.readManifest(conf, path)
    val partial: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("k", 5L))

    // same manifest: no conflict
    assert(KvCatalogTable.deleteConflict(schema, partial, snapshot, snapshot).isEmpty)

    // a segment appended AFTER the snapshot whose range overlaps k >= 5:
    // the DELETE never evaluated its rows — must abort and re-scan
    spark.sql("INSERT INTO kvrace.ns.t SELECT id, concat('b', id) FROM range(3, 8, 1, 1)")
    val withAppend = KvStore.readManifest(conf, path)
    assert(KvCatalogTable.deleteConflict(schema, partial, snapshot, withAppend)
      .exists(_.contains("appended")))
    // …but an appended segment the stats PROVE can't match is no conflict
    val lowOnly: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.LessThan("k", 3L))
    assert(KvCatalogTable.deleteConflict(schema, lowOnly, snapshot, withAppend).isEmpty)

    // a dv swap on a snapshot segment (concurrent DELETE committed first)
    val swapped = withAppend.map(e => e.copy(segs = e.segs.map(s =>
      if (snapshot.exists(_.segs.exists(_.name == s.name)))
        s.copy(dv = Some("dv-other.bin")) else s)))
    assert(KvCatalogTable.deleteConflict(schema, partial, withAppend, swapped)
      .exists(_.contains("deletion vector")))

    // end-to-end: the formerly-refused partial-overlap DELETE now lands as
    // a deletion vector — row-exact, no segment rewrite
    val segsBefore = KvStore.readManifest(conf, path).flatMap(_.segs.map(_.name)).toSet
    spark.sql("DELETE FROM kvrace.ns.t WHERE k >= 5")
    // 15 rows total: [0..9] keeps 5, [3..7] keeps {3,4} — 7 survive
    assert(spark.sql("SELECT count(*) FROM kvrace.ns.t").collect()(0).getLong(0) === 7L)
    assert(spark.sql("SELECT max(k) FROM kvrace.ns.t").collect()(0).getLong(0) === 4L)
    val after = KvStore.readManifest(conf, path)
    assert(after.flatMap(_.segs.map(_.name)).toSet === segsBefore,
      "merge-on-read: segment files unchanged, only dv references added")
    assert(after.flatMap(_.segs).count(_.dv.isDefined) === 2,
      "both overlapping segments carry a deletion vector")
  }
}
