package graft.core

/** Thin-plate-spline transformer — the engine's analog of the reference's
  * TPS warp path (reference: alg/thinplatespline.cpp :: VizGeorefSpline2D,
  * used by GDALCreateTPSTransformer). Given n control points (xᵢ,yᵢ)→vᵢ
  * the spline is f(x,y) = a + b·x + c·y + Σ wᵢ·U(r²ᵢ) with the radial
  * basis U(r²) = r²·ln(r²) (= 2r²ln r, the classic kernel up to the
  * constant the weights absorb) and the side conditions Σw = Σw·x =
  * Σw·y = 0. Fitting solves the dense (n+3)×(n+3) system once on the
  * driver by Gaussian elimination with partial pivoting — deterministic
  * pure double arithmetic, so the solved weights are bit-identical on
  * any IEEE JVM and can be embedded as literals in a SQL oracle.
  *
  * Evaluation discipline (the oracle contract): ln is
  * java.lang.StrictMath.log — the SAME fdlibm function Spark's
  * UnaryLogExpression codegen emits for SQL `ln` — and every +,·
  * happens in a fixed left-assoc order (affine first, then radial terms
  * in control-point order). [[evalSql]] prints that exact op sequence as
  * SQL text; the engine evaluates the SAME string via Spark `expr`, so
  * engine-vs-oracle divergence is limited to fdlibm-vs-libm ln ULPs,
  * absorbed by the queries' output quantization.
  */
object Tps {

  final case class Model(px: Array[Double], py: Array[Double],
                         wx: Array[Double], ax: Double, bx: Double, cx: Double,
                         wy: Array[Double], ay: Double, by: Double, cy: Double)

  /** U(r²) = r²·ln(r²), continuously extended with U(0) = 0. */
  def u(r2: Double): Double = if (r2 == 0.0) 0.0 else r2 * StrictMath.log(r2)

  /** Interpolating fit: control points (px,py) mapping to (vx,vy).
    * Solves both target dimensions against one factorization. */
  def fit(px: Array[Double], py: Array[Double],
          vx: Array[Double], vy: Array[Double]): Model = {
    val n = px.length
    require(n >= 3, "TPS needs >= 3 control points")
    val m = n + 3
    // augmented [L | vx vy]: L = [[K P],[P' 0]]
    val a = Array.ofDim[Double](m, m + 2)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val dx = px(i) - px(j); val dy = py(i) - py(j)
        a(i)(j) = u(dx * dx + dy * dy)
        j += 1
      }
      a(i)(n) = 1.0; a(i)(n + 1) = px(i); a(i)(n + 2) = py(i)
      a(n)(i) = 1.0; a(n + 1)(i) = px(i); a(n + 2)(i) = py(i)
      a(i)(m) = vx(i); a(i)(m + 1) = vy(i)
      i += 1
    }
    // Gaussian elimination, partial pivot (deterministic: ties keep the
    // first maximal row, all arithmetic is IEEE-ordered)
    var col = 0
    while (col < m) {
      var piv = col
      var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < m) {
        val v = math.abs(a(r)(col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      require(best > 0.0, s"singular TPS system at column $col")
      if (piv != col) { val t = a(piv); a(piv) = a(col); a(col) = t }
      r = col + 1
      while (r < m) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          var c = col
          while (c < m + 2) { a(r)(c) -= f * a(col)(c); c += 1 }
        }
        r += 1
      }
      col += 1
    }
    val solX = new Array[Double](m); val solY = new Array[Double](m)
    var rr = m - 1
    while (rr >= 0) {
      var sx = a(rr)(m); var sy = a(rr)(m + 1)
      var c = rr + 1
      while (c < m) { sx -= a(rr)(c) * solX(c); sy -= a(rr)(c) * solY(c); c += 1 }
      solX(rr) = sx / a(rr)(rr); solY(rr) = sy / a(rr)(rr)
      rr -= 1
    }
    Model(px.clone(), py.clone(),
      solX.take(n), solX(n), solX(n + 1), solX(n + 2),
      solY.take(n), solY(n), solY(n + 1), solY(n + 2))
  }

  /** (x,y) → (fx,fy), fixed op order: (a + b·x) + c·y, then += wᵢ·U in
    * control-point order — the same left-assoc chain [[evalSql]] prints. */
  def eval(m: Model, x: Double, y: Double): (Double, Double) = {
    var sx = (m.ax + m.bx * x) + m.cx * y
    var sy = (m.ay + m.by * x) + m.cy * y
    var i = 0
    while (i < m.px.length) {
      val dx = x - m.px(i); val dy = y - m.py(i)
      val uu = u(dx * dx + dy * dy)
      sx += m.wx(i) * uu
      sy += m.wy(i) * uu
      i += 1
    }
    (sx, sy)
  }

  /** The exact eval op sequence as SQL text over column expressions
    * xSql/ySql. The ENGINE runs this string through Spark `expr` and the
    * ORACLE runs the same string in DuckDB — op-sequence identity by
    * construction; coefficients embed as exact runtime doubles
    * (Double.toString round-trips). */
  def evalSql(m: Model, xSql: String, ySql: String, dim: Char): String = {
    val (w, a, b, c) =
      if (dim == 'x') (m.wx, m.ax, m.bx, m.cx) else (m.wy, m.ay, m.by, m.cy)
    def d(v: Double): String = java.lang.Double.toString(v)
    val terms = m.px.indices.map { i =>
      val r2 = s"(($xSql - ${d(m.px(i))}) * ($xSql - ${d(m.px(i))}) + " +
        s"($ySql - ${d(m.py(i))}) * ($ySql - ${d(m.py(i))}))"
      s"${d(w(i))} * (CASE WHEN $r2 = 0.0 THEN 0.0 ELSE $r2 * ln($r2) END)"
    }
    (s"(${d(a)} + ${d(b)} * $xSql + ${d(c)} * $ySql)" +: terms).mkString(" + ")
  }

  /** The q83/q84 synthetic model: a 3×3 control grid over the 1024×512
    * pixel domain, identity plus mild integer displacements (≤ 8 px at
    * the controls), fit once — both the engine queries and the oracle
    * generator read these solved doubles. */
  lazy val demo: Model = {
    val px = Array(0.0, 512.0, 1024.0, 0.0, 512.0, 1024.0, 0.0, 512.0, 1024.0)
    val py = Array(0.0, 0.0, 0.0, 256.0, 256.0, 256.0, 512.0, 512.0, 512.0)
    val ddx = Array(3.0, -5.0, 2.0, 4.0, -6.0, 1.0, -2.0, 5.0, -4.0)
    val ddy = Array(-2.0, 4.0, 1.0, 3.0, -5.0, -3.0, 5.0, -1.0, 2.0)
    val vx = px.indices.map(i => px(i) + ddx(i)).toArray
    val vy = py.indices.map(i => py(i) + ddy(i)).toArray
    fit(px, py, vx, vy)
  }
}
