package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.SfSmall).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracle coverage: every query has an oracle or is a documented rows-only op") {
    val rowsOnly = Set(
      "q19_warp_checksum",   // mercator trig — not bit-stable across engines
      "q24_minhash_lsh",     // permutation-hash dependent candidate set
      "q25_simhash",         // 64-bit token-hash dependent
      "q34_polygonize_wkt",  // WKT golden-matched vs JTS in PolygonizeSpec
      "q35_sieve",           // merge semantics pinned in PolygonizeSpec
      "q39_hillshade",       // trig — kernel pinned in FocalProxContourSpec
      "q42_contour_stitch",  // closure not SQL-expressible; pinned in spec
      "q45_ann_lsh")         // approximate recall by design
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }
}
