package graft.core

import org.locationtech.jts.geom._

/** MapInfo MIF geometry writer + parser — the OGR MITAB driver's text
  * half (reference: ogr/ogrsf_frmts/mitab/mitab_miffile.cpp ::
  * MIFFile::WriteFeature / ParseMIFGeometry). MIF is line/token-oriented
  * rather than XML: a geometry block is a keyword line followed by bare
  * `x y` coordinate lines, so the parser here is a whitespace tokenizer,
  * not the shared Xml reader. Number formatting is the same explicit
  * oracle-replayable contract as the other text drivers (GeoJson.fmt).
  *
  * Geometry mapping (the MIF spec's own):
  *  - Point           → `POINT x y`
  *  - LineString      → `PLINE n` + n coordinate lines
  *  - MultiLineString → `PLINE MULTIPLE k` + k sections (`n` + lines)
  *  - Polygon         → `REGION r` + r rings (`n` + lines); ring 1 is the
  *    shell, later rings are holes. MapInfo infers containment
  *    geometrically; our writer/parser pin the simpler first-is-shell
  *    convention (documented divergence, exact for the written form).
  * The parser additionally tolerates `LINE x1 y1 x2 y2` (the two-point
  * special form MapInfo writes for simple segments) and skips optional
  * trailing style clauses (`PEN (...)`, `BRUSH (...)`, `SYMBOL (...)`,
  * `SMOOTH`) — reader tolerance mirroring the reference's. */
object Mif {

  private def fmt(v: Double): String = GeoJson.fmt(v)

  private def line(c: Coordinate): String = s"${fmt(c.x)} ${fmt(c.y)}"

  private def section(cs: Array[Coordinate]): String =
    s"${cs.length}\n" + cs.map(line).mkString("\n")

  def write(g: Geometry): String = g match {
    case p: Point => s"POINT ${line(p.getCoordinate)}"
    case l: LineString => s"PLINE ${section(l.getCoordinates)}"
    case m: MultiLineString =>
      val secs = (0 until m.getNumGeometries)
        .map(i => section(m.getGeometryN(i).getCoordinates)).mkString("\n")
      s"PLINE MULTIPLE ${m.getNumGeometries}\n$secs"
    case p: Polygon =>
      val rings = Array(p.getExteriorRing) ++
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN)
      s"REGION ${rings.length}\n" +
        rings.map(r => section(r.getCoordinates)).mkString("\n")
    case other => sys.error(s"MIF cannot encode ${other.getGeometryType}")
  }

  // ---- parser: token stream over the block text ----

  private final class Toks(s: String) {
    private val ts = s.split("\\s+").filter(_.nonEmpty)
    private var i = 0
    def peek: Option[String] = if (i < ts.length) Some(ts(i)) else None
    def next(): String = {
      require(i < ts.length, s"MIF: unexpected end of block after ${ts.lastOption.getOrElse("")}")
      val t = ts(i); i += 1; t
    }
    def nextInt(): Int = {
      val t = next()
      require(t.forall(_.isDigit), s"MIF: expected a count, got '$t'")
      t.toInt
    }
    def nextD(): Double = java.lang.Double.parseDouble(next())
    // optional style clauses: PEN (...) / BRUSH (...) / SYMBOL (...) / SMOOTH
    def skipStyle(): Unit = {
      while (peek.exists(t => Set("PEN", "BRUSH", "SYMBOL", "SMOOTH")
          .contains(t.toUpperCase))) {
        val kw = next().toUpperCase
        if (kw != "SMOOTH" && peek.exists(_.startsWith("("))) {
          while (!next().endsWith(")")) ()
        }
      }
    }
    def eof: Boolean = { skipStyle(); i >= ts.length }
  }

  private def coords(t: Toks, n: Int): Array[Coordinate] =
    Array.fill(n)(new Coordinate(t.nextD(), t.nextD()))

  def parse(s: String): Geometry = {
    val f = GeomIO.factory
    val t = new Toks(s)
    val g = t.next().toUpperCase match {
      case "POINT" => f.createPoint(new Coordinate(t.nextD(), t.nextD()))
      case "LINE" =>
        f.createLineString(coords(t, 2))
      case "PLINE" =>
        if (t.peek.exists(_.equalsIgnoreCase("MULTIPLE"))) {
          t.next()
          val k = t.nextInt()
          val secs = Array.fill(k)(f.createLineString(coords(t, t.nextInt())))
          f.createMultiLineString(secs)
        } else f.createLineString(coords(t, t.nextInt()))
      case "REGION" =>
        val r = t.nextInt()
        require(r >= 1, "MIF REGION needs at least one ring")
        val rings = Array.fill(r) {
          val cs = coords(t, t.nextInt())
          // MIF rings may omit the closing vertex; JTS requires it
          val closed = if (cs.head.equals2D(cs.last)) cs else cs :+ cs.head.copy()
          f.createLinearRing(closed)
        }
        f.createPolygon(rings.head, rings.tail)
      case other => sys.error(s"unsupported MIF keyword '$other'")
    }
    require(t.eof, "trailing tokens in MIF block")
    g
  }
}
