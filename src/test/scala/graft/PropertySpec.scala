package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

/** Property-based laws over the pure scalar cores — the algebraic
  * invariants that must hold for EVERY input, not just the specs' chosen
  * vectors. Each property is a round-trip or conservation law the
  * distributed operators lean on. Raw ScalaCheck (no scalatestplus
  * bridge in the offline cache): 200 cases per law, seed-free. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("Hilbert xy2d/d2xy are inverse bijections at every order 1..8") {
    import graft.core.Hilbert
    val gen = for {
      n <- Gen.choose(1, 8)
      x <- Gen.choose(0L, (1L << n) - 1)
      y <- Gen.choose(0L, (1L << n) - 1)
    } yield (n, x, y)
    check(forAll(gen) { case (n, x, y) =>
      val d = Hilbert.xy2d(n, x, y)
      val (x2, y2) = Hilbert.d2xy(n, d)
      d >= 0 && d < (1L << (2 * n)) && x2 == x && y2 == y
    })
  }

  test("ZCell pack/unpack round-trips and parent covers child") {
    import graft.core.ZCell
    val gen = for {
      z <- Gen.choose(1, 20)
      tx <- Gen.choose(0L, (1L << z) - 1)
      ty <- Gen.choose(0L, (1L << z) - 1)
    } yield (z, tx, ty)
    check(forAll(gen) { case (z, tx, ty) =>
      val c = ZCell.pack(z, tx, ty)
      val (z2, tx2, ty2) = ZCell.unpack(c)
      val p = ZCell.parent(c)
      z2 == z && tx2 == tx && ty2 == ty &&
        ZCell.zoom(p) == z - 1 && ZCell.tx(p) == tx >> 1 && ZCell.ty(p) == ty >> 1
    })
  }

  test("CSV line/fields are inverse for arbitrary field content") {
    import graft.core.OgrVrt
    // csv_line's quoting contract replayed scalar-side: quote iff the
    // field contains a comma, quote, or line break; embedded quotes double
    def csvLine(fields: Seq[String]): String = fields.map { f =>
      if (f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + f.flatMap(c => if (c == '"') "\"\"" else c.toString) + "\""
      else f
    }.mkString(",")
    val field = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', ' ', '\n', 'ß', '中')))
      .map(_.mkString)
    val gen = Gen.nonEmptyListOf(field)
    check(forAll(gen) { fields =>
      OgrVrt.csvSplit(csvLine(fields)).toSeq == fields
    })
  }

  test("OGRParseDate re-parses every datetime it could have printed") {
    import graft.core.OgrDate
    val gen = for {
      y <- Gen.choose(1, 9999); m <- Gen.choose(1, 12); d <- Gen.choose(1, 31)
      hh <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); ss <- Gen.choose(0, 59)
      tzq <- Gen.choose(-47, 48) // 15-minute steps, −11:45 … +12:00
      variant <- Gen.choose(0, 3)
    } yield (y, m, d, hh, mi, ss, tzq, variant)
    check(forAll(gen) { case (y, m, d, hh, mi, ss, tzq, variant) =>
      val base = f"$y%04d-$m%02d-$d%02d $hh%02d:$mi%02d:$ss%02d"
      val (s, tzFlag) = variant match {
        case 0 => (base, 0)
        case 1 => (base + "Z", 100)
        case 2 =>
          val sign = if (tzq >= 0) "+" else "-"
          val a = math.abs(tzq)
          (base + f"$sign${a / 4}%02d:${(a % 4) * 15}%02d", 100 + tzq)
        case _ => (f"$y%04d/$m%02d/$d%02d", -1) // date-only, '/' separator
      }
      val p = OgrDate.parse(s)
      if (variant == 3) p == OgrDate.Parsed(y, m, d, 0, 0, 0, 0)
      else p == OgrDate.Parsed(y, m, d, hh, mi, ss * 1000, tzFlag)
    })
  }

  test("mix64 is a bijection on sampled longs (no observed collisions) and matches the HUGEINT replay law") {
    import graft.core.TextCore
    val gen = Gen.choose(Long.MinValue, Long.MaxValue)
    check(forAll(gen) { x =>
      // the oracle replays mix64 mod 2^64 over non-negative HUGEINT:
      // engine's signed result reinterprets to the same 64-bit pattern
      val m = TextCore.mix64(x)
      val viaBig = {
        val M = BigInt(1) << 64
        def mod(b: BigInt) = ((b % M) + M) % M
        var z = mod(BigInt(x) + BigInt("9e3779b97f4a7c15", 16))
        def mul(a: BigInt, c: BigInt) = mod(a * c)
        z = mul(z ^ (z >> 30), BigInt("bf58476d1ce4e5b9", 16))
        z = mul(z ^ (z >> 27), BigInt("94d049bb133111eb", 16))
        z = z ^ (z >> 31)
        z.longValue
      }
      m == viaBig
    })
  }

  test("Albers forward/inverse round-trip for arbitrary in-domain points") {
    import graft.core.Albers
    val gen = for {
      lon <- Gen.choose(-17999, 17999).map(_ / 100.0)
      lat <- Gen.choose(-8400, 8400).map(_ / 100.0)
      c <- Gen.oneOf(Albers.crs5070, Albers.crs3577)
    } yield (lon, lat, c)
    check(forAll(gen) { case (lon, lat, c) =>
      val (e, n) = Albers.forward(lon, lat, c)
      val (lon2, lat2) = Albers.inverse(e, n, c)
      val dl = { val d = lon2 - lon; if (d > 180) d - 360 else if (d < -180) d + 360 else d }
      math.abs(dl) < 1e-8 && math.abs(lat2 - lat) < 1e-8
    })
  }
}
