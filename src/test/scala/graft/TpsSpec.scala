package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tps

class TpsSpec extends AnyFunSuite {

  test("fit interpolates: eval at every control point reproduces its target") {
    val m = Tps.demo
    m.px.indices.foreach { i =>
      val (fx, fy) = Tps.eval(m, m.px(i), m.py(i))
      // targets were identity + the demo displacements
      val ddx = Array(3.0, -5.0, 2.0, 4.0, -6.0, 1.0, -2.0, 5.0, -4.0)
      val ddy = Array(-2.0, 4.0, 1.0, 3.0, -5.0, -3.0, 5.0, -1.0, 2.0)
      assert(math.abs(fx - (m.px(i) + ddx(i))) < 1e-6, s"x at control $i")
      assert(math.abs(fy - (m.py(i) + ddy(i))) < 1e-6, s"y at control $i")
    }
  }

  test("side conditions hold: sum w = sum w*x = sum w*y = 0 (both dims)") {
    val m = Tps.demo
    for ((w, tag) <- Seq((m.wx, "x"), (m.wy, "y"))) {
      val s0 = w.sum
      val s1 = w.indices.map(i => w(i) * m.px(i)).sum
      val s2 = w.indices.map(i => w(i) * m.py(i)).sum
      assert(math.abs(s0) < 1e-9, s"sum w ($tag)")
      assert(math.abs(s1) < 1e-5, s"sum w*x ($tag)")
      assert(math.abs(s2) < 1e-5, s"sum w*y ($tag)")
    }
  }

  test("affine targets collapse to the affine: weights ~0, far-field eval exact-ish") {
    val px = Array(0.0, 512.0, 1024.0, 0.0, 512.0, 1024.0, 0.0, 512.0, 1024.0)
    val py = Array(0.0, 0.0, 0.0, 256.0, 256.0, 256.0, 512.0, 512.0, 512.0)
    val vx = px.indices.map(i => 2.0 * px(i) + 0.5 * py(i) + 7.0).toArray
    val vy = px.indices.map(i => -0.25 * px(i) + 1.5 * py(i) - 3.0).toArray
    val m = Tps.fit(px, py, vx, vy)
    (m.wx ++ m.wy).foreach(w => assert(math.abs(w) < 1e-9, "radial weights"))
    val (fx, fy) = Tps.eval(m, 300.0, 100.0)
    assert(math.abs(fx - (2.0 * 300.0 + 0.5 * 100.0 + 7.0)) < 1e-4)
    assert(math.abs(fy - (-0.25 * 300.0 + 1.5 * 100.0 - 3.0)) < 1e-4)
  }

  test("evalSql replays eval through DuckDB-free arithmetic check (Spark expr)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val m = Tps.demo
    // engine-side expr(evalSql) vs scalar eval on a grid of probe points:
    // both use StrictMath.log (Spark ln codegen = StrictMath), so the
    // agreement must be EXACT, not approximate
    val rows = spark.range(200)
      .withColumn("x", expr("CAST((id * 7919) % 1048576 AS DOUBLE) / 1024.0"))
      .withColumn("y", expr("CAST((id * 104729) % 524288 AS DOUBLE) / 1024.0"))
      .withColumn("samp", expr(Tps.evalSql(m, "x", "y", 'x')))
      .withColumn("line", expr(Tps.evalSql(m, "x", "y", 'y')))
      .collect()
    rows.foreach { r =>
      val (sx, sy) = Tps.eval(m, r.getAs[Double]("x"), r.getAs[Double]("y"))
      assert(r.getAs[Double]("samp") == sx, s"samp at id ${r.getAs[Long]("id")}")
      assert(r.getAs[Double]("line") == sy, s"line at id ${r.getAs[Long]("id")}")
    }
  }
}
