package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Raster
import graft.core.Resample
import graft.synth.Synth

/** gdal_translate / gdal_calc / MODE pyramid analogs vs scalar oracles. */
class TranslateCalcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def synthPixel(zoom: Int, tx: Long, ty: Long, px: Int, py: Int): Double =
    ((tx * 131 + ty * 173 + px * 7 + py * 11 + zoom) % 256).toDouble

  test("translate: window crop + scale/offset/clamp == direct slice") {
    val (x0, y0, outW, outH) = (100L, 50L, 300L, 200L)
    val got = Raster.translate(Synth.tiles(spark, 3), 64, 64, x0, y0, outW, outH,
      scale = 2.0, offset = 1.0, clampMin = 0.0, clampMax = 255.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Double](2).toArray)).toMap
    // oracle: per dst tile, sample the source directly
    val nTx = (outW + 63) / 64; val nTy = (outH + 63) / 64
    for (dty <- 0L until nTy; dtx <- 0L until nTx) {
      val want = Array.tabulate(64 * 64) { i =>
        val dx = dtx * 64 + i % 64; val dy = dty * 64 + i / 64
        if (dx >= outW || dy >= outH) 0.0
        else {
          val gx = x0 + dx; val gy = y0 + dy
          val v = synthPixel(3, gx / 64, gy / 64, (gx % 64).toInt, (gy % 64).toInt) * 2.0 + 1.0
          math.max(0.0, math.min(255.0, v))
        }
      }
      assert(got((dtx, dty)).sameElements(want), s"dst tile ($dtx,$dty)")
    }
    assert(got.size == (nTx * nTy))
  }

  test("translate: unaligned window spanning tile seams, identity scale") {
    val got = Raster.translate(Synth.tiles(spark, 3), 64, 64, 63, 63, 66, 66)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Double](2).toArray)).toMap
    assert(got.size == 4) // 66x66 window → 2x2 dst tiles
    val want00 = Array.tabulate(64 * 64) { i =>
      val gx = 63 + i % 64; val gy = 63 + i / 64
      synthPixel(3, gx / 64, gy / 64, (gx % 64).toInt, (gy % 64).toInt)
    }
    assert(got((0L, 0L)).sameElements(want00))
  }

  test("calc: a + 2*b matches per-pixel arithmetic") {
    val a = Synth.tiles(spark, 2)
    val b = Synth.tiles(spark, 2)
      .withColumn("pixels", expr("transform(pixels, p -> (p * 3.0 + 1.0) % 128.0)"))
    val row = Raster.calc(a, b, "a + 2.0 * b")
      .where(col("tx") === 1 && col("ty") === 1)
      .collect().head
    val got = row.getSeq[Double](row.fieldIndex("pixels"))
    for (i <- 0 until 64 * 64) {
      val va = synthPixel(2, 1, 1, i % 64, i / 64)
      val vb = (va * 3.0 + 1.0) % 128.0
      assert(got(i) == va + 2.0 * vb, s"pixel $i")
    }
  }

  test("mode downsample: hand cases incl. ties") {
    // all equal → that value; 3-1 majority; 2-2 tie → smallest
    assert(Resample.downsample2x2Mode(Array(5.0, 5.0, 5.0, 5.0), 2, 2).head == 5.0)
    assert(Resample.downsample2x2Mode(Array(7.0, 7.0, 7.0, 2.0), 2, 2).head == 7.0)
    assert(Resample.downsample2x2Mode(Array(9.0, 2.0, 2.0, 9.0), 2, 2).head == 2.0)
    assert(Resample.downsample2x2Mode(Array(4.0, 3.0, 2.0, 1.0), 2, 2).head == 1.0)
  }

  test("pyramid MODE level matches whole-grid scalar reduce") {
    val got = Raster.pyramidUp(Synth.tiles(spark, 2), method = "mode")
      .collect().map(r => ((r.getLong(1), r.getLong(2)), r.getSeq[Double](3).toArray)).toMap
    for (((tx, ty), px) <- got) {
      // child mosaic 128x128 → mode-reduce to 64x64
      val child = Array.tabulate(128 * 128) { i =>
        val gx = tx * 128 + i % 128; val gy = ty * 128 + i / 128
        synthPixel(2, gx / 64, gy / 64, (gx % 64).toInt, (gy % 64).toInt)
      }
      val want = Resample.downsample2x2Mode(child, 128, 128)
      assert(px.sameElements(want), s"parent ($tx,$ty)")
    }
  }

  test("colorRelief: generated CASE == scalar round-half-up interpolation, incl. clamps") {
    // ramp deliberately NOT starting at 0 (below-first clamp fires) and
    // with rising + falling channel segments (both signs of dc)
    val ramp = Seq((10, 5, 200, 30), (50, 250, 40, 30), (120, 0, 255, 200), (250, 90, 0, 10))
    def scalar(v: Int, get: ((Int, Int, Int, Int)) => Int): Long = {
      if (v < ramp.head._1) get(ramp.head).toLong
      else if (v >= ramp.last._1) get(ramp.last).toLong
      else {
        val Seq(lo, hi) = ramp.sliding(2).find { case Seq(_, h) => v < h._1 }.get
        val de = hi._1 - lo._1; val dc = get(hi) - get(lo)
        val q = (2L * (v - lo._1) * math.abs(dc) + de) / (2L * de)
        if (dc >= 0) get(lo) + q else get(lo) - q
      }
    }
    val out = Raster.colorRelief(Synth.tiles(spark, 2), ramp)
      .collect()
      .map(r => ((r.getLong(1), r.getLong(2), r.getInt(3)), r.getSeq[Double](4).toArray))
      .toMap
    val gets = Map(1 -> ((c: (Int, Int, Int, Int)) => c._2),
      2 -> ((c: (Int, Int, Int, Int)) => c._3), 3 -> ((c: (Int, Int, Int, Int)) => c._4))
    for (ty <- 0L until 4L; tx <- 0L until 8L; band <- 1 to 3) {
      val want = Array.tabulate(64 * 64) { i =>
        scalar(synthPixel(2, tx, ty, i % 64, i / 64).toInt, gets(band)).toDouble
      }
      assert(out((tx, ty, band)).sameElements(want), s"tile ($tx,$ty) band $band")
    }
  }

  test("colorRelief nearest/exact modes == scalar selection rules") {
    val ramp = Seq((10, 5, 200, 30), (51, 250, 40, 30), (120, 0, 255, 200), (251, 90, 0, 10))
    val gets = Map(1 -> ((c: (Int, Int, Int, Int)) => c._2),
      2 -> ((c: (Int, Int, Int, Int)) => c._3), 3 -> ((c: (Int, Int, Int, Int)) => c._4))
    // nearest: pick the entry minimizing |v - e| (odd gaps -> no ties)
    def nearestScalar(v: Int, get: ((Int, Int, Int, Int)) => Int): Long =
      get(ramp.minBy(e => math.abs(v - e._1))).toLong
    // exact: matching entry's color, else 0
    def exactScalar(v: Int, get: ((Int, Int, Int, Int)) => Int): Long =
      ramp.find(_._1 == v).map(get(_).toLong).getOrElse(0L)
    for ((mode, scalar) <- Seq("nearest" -> nearestScalar _, "exact" -> exactScalar _)) {
      val out = Raster.colorRelief(Synth.tiles(spark, 1), ramp, mode)
        .collect()
        .map(r => ((r.getLong(1), r.getLong(2), r.getInt(3)), r.getSeq[Double](4).toArray))
        .toMap
      for (ty <- 0L until 2L; tx <- 0L until 4L; band <- 1 to 3) {
        val want = Array.tabulate(64 * 64) { i =>
          scalar(synthPixel(1, tx, ty, i % 64, i / 64).toInt, gets(band)).toDouble
        }
        assert(out((tx, ty, band)).sameElements(want), s"$mode tile ($tx,$ty) band $band")
      }
    }
  }
}
