package graft.sinks.v2

import org.scalatest.funsuite.AnyFunSuite

/**
 * The deleteWhere OCC re-check (in-package to reach the private[v2]
 * helpers): canDeleteWhere runs BEFORE the CAS, so a segment appended
 * concurrently that only partially matches the predicate would — without
 * the in-closure re-check — let the DELETE commit "successfully" while
 * leaving matching rows behind. The closure re-runs decidability per CAS
 * attempt and aborts like compact does; this spec drives that predicate
 * directly against the exact manifest states involved.
 */
class KvDeleteRaceSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("deleteWhere decidability re-check flags a partial-match segment") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kvrace_").toString
    spark.conf.set("spark.sql.catalog.kvrace", "graft.sinks.v2.GraftKvCatalog")
    spark.conf.set("spark.sql.catalog.kvrace.warehouse", dir)
    spark.sql("CREATE TABLE kvrace.ns.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO kvrace.ns.t SELECT id, concat('a', id) FROM range(0, 10, 1, 1)")
    val path = s"$dir/ns/t"
    val conf = spark.sessionState.newHadoopConf()
    val schema = KvStore.readSchema(conf, path).get
    val manifest = KvStore.readManifest(conf, path)
    // k >= 5 partially overlaps the [0,10) segment: undecidable — the SAME
    // verdict the closure must reach when such a segment appears between
    // canDeleteWhere and the CAS, making the commit abort (manifest
    // unchanged) instead of silently keeping matching rows
    val partial: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("k", 5L))
    assert(KvCatalogTable.hasUndecidableSegment(schema, partial, manifest))
    // epoch-aligned predicates stay decidable (exact _epoch bounds)
    val byEpoch: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.EqualTo("_epoch", 0L))
    assert(!KvCatalogTable.hasUndecidableSegment(schema, byEpoch, manifest))
    // and a fully-covering range predicate too
    val covering: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("k", 0L))
    assert(!KvCatalogTable.hasUndecidableSegment(schema, covering, manifest))
    // end-to-end: the undecidable predicate refuses, store unchanged
    val e = intercept[Exception](
      spark.sql("DELETE FROM kvrace.ns.t WHERE k >= 5"))
    assert(e.getMessage.toLowerCase.contains("delete"))
    assert(spark.sql("SELECT count(*) FROM kvrace.ns.t").collect()(0).getLong(0) === 10L)
  }
}
