package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class CoreSpec extends AnyFunSuite {
  // seeded property loops (scalatestplus bridge unavailable offline)
  private def forSeeded(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rng = new scala.util.Random(42); (0 until n).foreach(_ => body(rng))
  }

  test("ZCell pack/unpack roundtrip (property)") {
    forSeeded(500) { rng =>
      val z = rng.nextInt(21)
      val x = math.abs(rng.nextLong()) % (1L << (z + 1))
      val y = math.abs(rng.nextLong()) % math.max(1L, 1L << z)
      val c = ZCell.pack(z, x, y)
      assert(ZCell.zoom(c) == z && ZCell.tx(c) == x && ZCell.ty(c) == y)
    }
  }

  test("ZCell parent/children consistency") {
    val c = ZCell.pack(5, 13, 9)
    assert(ZCell.children(c).forall(ch => ZCell.parent(ch) == c))
  }

  test("ring r covers exactly the Chebyshev shell, disk has no duplicates") {
    val c = ZCell.pack(6, 50, 30)
    for (r <- 0 to 3) {
      val shell = ZCell.ring(c, r, colsShift = 1)
      assert(shell.distinct.length == shell.length)
      shell.foreach { s =>
        val d = math.max(math.abs(ZCell.tx(s) - 50), math.abs(ZCell.ty(s) - 30))
        assert(d == r, s"cell at chebyshev $d in ring $r")
      }
      if (r > 0) assert(shell.length == 8 * r) // interior cell, no clamping
    }
  }

  test("geodetic tile encode matches bounds") {
    forSeeded(500) { rng =>
      val lon = rng.nextDouble() * 359.98 - 179.99
      val lat = rng.nextDouble() * 179.98 - 89.99
      val z = rng.nextInt(13)
      val tx = TileMath.geoTileX(lon, z); val ty = TileMath.geoTileY(lat, z)
      val (w, s, e, n) = TileMath.geoTileBounds(z, tx, ty)
      assert(lon >= w && lon <= e, s"$lon not in [$w,$e]")
      assert(lat >= s && lat <= n, s"$lat not in [$s,$n]")
    }
  }

  test("mercator 4326<->3857 roundtrip") {
    forSeeded(500) { rng =>
      val lon = rng.nextDouble() * 358 - 179; val lat = rng.nextDouble() * 168 - 84
      val x = TileMath.lonToMercX(lon); val y = TileMath.latToMercY(lat)
      assert(math.abs(TileMath.mercXToLon(x) - lon) < 1e-9)
      assert(math.abs(TileMath.mercYToLat(y) - lat) < 1e-9)
    }
  }

  test("checksum: constant tile and known small case") {
    // 2x2 tile [1,2,3,4]: 1*1+2*2+3*3+4*4 = 30
    assert(Checksum.checksum(Array(1.0, 2.0, 3.0, 4.0), 2, 2) == 30)
    // NaN treated as 0
    assert(Checksum.checksum(Array(Double.NaN, 2.0), 2, 1) == 4)
  }

  test("mulMod61 matches BigInt") {
    forSeeded(2000) { rng =>
      val a = math.abs(rng.nextLong()) % TextCore.FpMod
      val b = math.abs(rng.nextLong()) % 100000L
      val want = (BigInt(a) * BigInt(b) % BigInt(TextCore.FpMod)).toLong
      assert(TextCore.mulMod61(a, b) == want)
    }
  }

  test("jaccard on sorted long arrays") {
    assert(TextCore.jaccard(Array(1L, 2L, 3L), Array(2L, 3L, 4L)) == 0.5)
    assert(TextCore.jaccard(Array.empty[Long], Array.empty[Long]) == 1.0)
    assert(TextCore.jaccard(Array(1L), Array(2L)) == 0.0)
  }

  test("minhash similarity approximates jaccard") {
    val a = TextCore.wordShingles("the quick brown fox jumps over the lazy dog again and again", 2)
    val b = TextCore.wordShingles("the quick brown fox jumps over the lazy cat again and again", 2)
    val trueJ = TextCore.jaccard(a, b)
    val sa = TextCore.minhash(a, 256); val sb = TextCore.minhash(b, 256)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    assert(math.abs(est - trueJ) < 0.2, s"est $est vs true $trueJ")
  }

  test("simhash: identical texts collide, different texts differ") {
    val h1 = TextCore.simhash64("alpha beta gamma delta")
    val h2 = TextCore.simhash64("alpha beta gamma delta")
    val h3 = TextCore.simhash64("completely different words entirely")
    assert(h1 == h2)
    assert(TextCore.hamming64(h1, h3) > 4)
  }

  test("langId deterministic rules") {
    assert(TextCore.langId("the cat and the dog of a house") == "en")
    assert(TextCore.langId("der hund und die katze ist nicht") == "de")
    assert(TextCore.langId("xyzzy plugh") == "und")
  }

  test("st_buffer / st_simplify through the Column API") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.F
    F.ensureRegistered(spark)
    // simplify: Douglas-Peucker removes exactly the collinear midpoints
    val line = Seq("LINESTRING(0 0, 1 1, 2 2, 3 3)").toDF("wkt")
      .select(F.st_astext(F.st_simplify(F.st_geomfromwkt(col("wkt")), lit(0.001))).as("s"))
      .collect()(0).getString(0)
    assert(line == "LINESTRING (0 0, 3 3)")
    // buffer: contains the original, area grows at least by perimeter*d
    val row = Seq("POLYGON((0 0, 4 0, 4 2, 0 2, 0 0))").toDF("wkt")
      .select(F.st_geomfromwkt(col("wkt")).as("g"))
      .select(F.st_buffer(col("g"), lit(0.5)).as("b"), col("g"))
      .select(F.st_area(col("b")).as("ba"),
        call_function("st_contains", col("b"), col("g")).as("cont"))
      .collect()(0)
    assert(row.getBoolean(1))
    assert(row.getDouble(0) > 8.0 + 12.0 * 0.5 && row.getDouble(0) < 8.0 + 12.0 * 0.5 + math.Pi * 0.25 + 1e-9)
  }

  test("resample bilinear interpolates linear ramps exactly") {
    val src: (Int, Int) => Double = (x, y) =>
      if (x < 0 || y < 0 || x > 9 || y > 9) Double.NaN else x.toDouble + 2.0 * y
    // center of pixel (3,4) is (3.5, 4.5) -> value 3 + 8 = 11
    assert(Resample.bilinear(src, 3.5, 4.5) == 11.0)
    // halfway between pixel centers
    assert(Resample.bilinear(src, 4.0, 4.5) == 11.5)
  }
}
