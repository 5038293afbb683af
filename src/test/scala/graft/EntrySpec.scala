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

  test("GraftExtensions installs the function surface via the extensions seam") {
    import org.apache.spark.sql.SparkSession
    val orig = spark // force TestSpark init first
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions().apply _)
      .getOrCreate() // new session over the running SparkContext
    try {
      val a = s2.sql(
        "SELECT st_area(st_geomfromwkt('POLYGON((0 0,2 0,2 3,0 3,0 0))')) AS a")
        .collect().head.getDouble(0)
      assert(a == 6.0)
      val c = s2.sql("SELECT cell_zoom(cell_encode(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 5)) AS z")
        .collect().head.getLong(0)
      assert(c == 5L)
    } finally {
      SparkSession.setDefaultSession(orig); SparkSession.setActiveSession(orig)
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
      "q45_ann_lsh",         // approximate recall by design
      "q57_contour_wkt")     // double-formatted WKT; pinned vs giant-tile in spec
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }
}
